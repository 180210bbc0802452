package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan gates for the corpus-selection operators (q90-q93).
  * Each query also runs through the DuckDB oracle; the tests here pin
  * the invariants the row hash cannot see (plan shape, equivalence of
  * the scale-shaped implementation to the naive definition). */
class SelectionQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf001

  test("q90: per-source kept counts are min(count, CAP)") {
    val docs = Tables.load(spark, dir, "documents")
    val expected = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> math.min(r.getLong(1), 20L)).toMap
    val got = SelectionQueries.q90DomainCap(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q90: exactly one window — the pre-prune is exchange-free local ranking") {
    val p = SelectionQueries.q90DomainCap(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.sliding(7).count(_ == "Window ") == 1,
      s"expected exactly one Window node (final cap), got plan:\n$p")
    // the surviving window must run over locally pre-pruned rows; the
    // local rank shows up either as the named _lrn column or inlined by
    // Catalyst into the join condition ((_mono - _base) + 1 <= CAP)
    val winAt = p.indexOf("Window ")
    assert(p.indexOf("_lrn", winAt) > winAt || p.indexOf("_mono", winAt) > winAt,
      s"final window input is not the local-rank pre-prune:\n$p")
  }

  test("q90: two-phase cap equals the plain per-source window") {
    val docs = Tables.load(spark, dir, "documents")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val naive = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).select("doc_id").collect().map(_.getLong(0)).toSet
    val got = SelectionQueries.q90DomainCap(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == naive)
  }

  test("q91: cross pairs are exactly q22's opposite-parity pairs") {
    val cross = DedupQueries.q91CrossDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // q22 emits doc_a < doc_b over the whole corpus; restricting it to
    // opposite-parity pairs and normalizing to (even, odd) must yield
    // the same set — q91 just never generates the same-side candidates
    val fromQ22 = DedupQueries.q22JaccardNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 2 != b % 2 }
      .map { case (a, b) => if (a % 2 == 0) (a, b) else (b, a) }.toSet
    assert(cross == fromQ22)
    assert(cross.forall { case (o, n) => o % 2 == 0 && n % 2 == 1 })
  }

  test("q92: verdict is a pure map — zero exchanges in the plan") {
    val p = SelectionQueries.q92BlocklistFilter(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"blocklist filter shuffled:\n$p")
  }

  test("q92: n_hits counts blocklist tokens, keep == (n_hits == 0)") {
    val rows = SelectionQueries.q92BlocklistFilter(spark, dir).collect()
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bl = Set("slow", "drop", "stale")
    rows.foreach { r =>
      val exp = texts(r.getLong(0)).trim.toLowerCase.split("\\s+")
        .count(tk => tk.nonEmpty && bl(tk))
      assert(r.getInt(1) == exp, s"doc ${r.getLong(0)}")
      assert(r.getBoolean(2) == (exp == 0))
    }
    assert(rows.exists(_.getInt(1) > 0) && rows.exists(_.getInt(1) == 0))
  }

  test("q93: rank-arithmetic terciles equal ntile(3) exactly") {
    val lm = RetrievalQueries.q47TrigramLm(spark, dir)
    val scored = lm.join(
      Tables.load(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
    val naive = scored.withColumn("bucket",
        ntile(3).over(Window.partitionBy("lang")
          .orderBy(col("avg_logp").desc, col("doc_id").asc)))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), round(avg("avg_logp"), 4).as("mean_logp"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val got = SelectionQueries.q93CcnetBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == naive)
  }

  test("q93: no per-language single-task sort — ranking is one range exchange") {
    val p = SelectionQueries.q93CcnetBuckets(spark, dir)
      .queryExecution.executedPlan.toString
    // the naive shape would show Window [ntile(...)] over a hash
    // exchange on lang; the shipped plan must not contain ntile at all
    assert(!p.contains("ntile"), s"q93 fell back to a per-lang ntile window:\n$p")
  }
}
