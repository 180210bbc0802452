package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations._

/** Data-validation surfaces — the "gate before you spend GPU-hours"
  * tier of a training pipeline: declarative expectations over a table
  * (q112) and referential-integrity audit across the star schema (q113).
  * The reference encodes these invariants as DB schema constraints
  * (database/model.go:48-67 unique names, NOT NULL columns, FK
  * relations); parquet has no constraint engine, so a corpus-scale
  * pipeline has to CHECK them — once per scan, never per-row-per-rule. */
object AuditQueries {

  /** Corpus expectations suite: schema-shaped checks over `documents` in
    * ONE aggregate pass ([[Expectations.run]] compiles all checks into a
    * single agg; uniqueness rides the same pass via Expand). The report
    * is |checks| rows, exchange-free above the 1-row aggregate. */
  def q112Expectations(s: SparkSession, dir: String): DataFrame =
    Expectations.run(Tables.load(s, dir, "documents"), Seq(
      notNull("doc_id"),
      unique("doc_id"),
      notNull("text"),
      inSet("lang", Seq("en", "es", "de", "fr", "zh")),
      nonNegative("n_chars"),
      holds("chars_match(n_chars,text)", col("n_chars") === length(col("text")))))

  /** One FK edge: children = non-null child keys, orphans = child keys
    * with no parent. LEFT join against the DISTINCT parent-key set, so
    * the verdict and the count come from one join + one aggregate; small
    * dims broadcast, big ones shuffle on the key — either way one pass
    * over the child table per edge, no per-row lookups. */
  private[graft] def fkEdge(name: String, child: DataFrame, key: String,
      parent: DataFrame, pkey: String): DataFrame =
    child.select(col(key).as("k")).filter(col("k").isNotNull)
      .join(parent.select(col(pkey).as("k")).distinct()
        .withColumn("_hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("children"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("orphans"))
      .select(lit(name).as("edge"), col("children"),
        coalesce(col("orphans"), lit(0L)).as("orphans"),
        (coalesce(col("orphans"), lit(0L)) === 0L).as("pass"))

  /** Referential-integrity audit over the TPC-H-ish star: every FK edge
    * the query surfaces join on, each certified by one scan-and-join. */
  def q113FkAudit(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.load(s, dir, n)
    fkEdge("lineitem.l_orderkey->orders", t("lineitem"), "l_orderkey",
        t("orders"), "o_orderkey")
      .unionByName(fkEdge("lineitem.l_partkey->part", t("lineitem"),
        "l_partkey", t("part"), "p_partkey"))
      .unionByName(fkEdge("lineitem.l_suppkey->supplier", t("lineitem"),
        "l_suppkey", t("supplier"), "s_suppkey"))
      .unionByName(fkEdge("orders.o_custkey->customer", t("orders"),
        "o_custkey", t("customer"), "c_custkey"))
      .unionByName(fkEdge("customer.c_nationkey->nation", t("customer"),
        "c_nationkey", t("nation"), "n_nationkey"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_expectations" -> q112Expectations _,
    "q113_fk_audit" -> q113FkAudit _
  )

  val oracle: Map[String, String] = Map(
    "q112_expectations" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents)
        |SELECT 'not_null(doc_id)' AS "check", n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id IS NULL) AS violations,
        |  (SELECT count(*) FROM documents WHERE doc_id IS NULL) = 0 AS pass FROM n
        |UNION ALL
        |SELECT 'unique(doc_id)', n_rows,
        |  (SELECT CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents),
        |  (SELECT count(*) - count(DISTINCT doc_id) FROM documents) = 0 FROM n
        |UNION ALL
        |SELECT 'not_null(text)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE text IS NULL),
        |  (SELECT count(*) FROM documents WHERE text IS NULL) = 0 FROM n
        |UNION ALL
        |SELECT 'in_set(lang)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE lang IS NULL OR lang NOT IN ('en','es','de','fr','zh')),
        |  (SELECT count(*) FROM documents
        |     WHERE lang IS NULL OR lang NOT IN ('en','es','de','fr','zh')) = 0 FROM n
        |UNION ALL
        |SELECT 'non_negative(n_chars)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE n_chars IS NULL OR NOT (n_chars >= 0)),
        |  (SELECT count(*) FROM documents
        |     WHERE n_chars IS NULL OR NOT (n_chars >= 0)) = 0 FROM n
        |UNION ALL
        |SELECT 'chars_match(n_chars,text)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE n_chars IS NULL OR text IS NULL OR n_chars <> length(text)),
        |  (SELECT count(*) FROM documents
        |     WHERE n_chars IS NULL OR text IS NULL OR n_chars <> length(text)) = 0 FROM n""".stripMargin,
    "q113_fk_audit" ->
      """SELECT 'lineitem.l_orderkey->orders' AS edge,
        |  CAST(count(*) AS BIGINT) AS children,
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans,
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0 AS pass
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  ON c.l_orderkey = p.k WHERE c.l_orderkey IS NOT NULL
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |  ON c.l_partkey = p.k WHERE c.l_partkey IS NOT NULL
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |  ON c.l_suppkey = p.k WHERE c.l_suppkey IS NOT NULL
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |  ON c.o_custkey = p.k WHERE c.o_custkey IS NOT NULL
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |  ON c.c_nationkey = p.k WHERE c.c_nationkey IS NOT NULL""".stripMargin
  )
}
