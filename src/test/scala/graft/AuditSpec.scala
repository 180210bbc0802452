package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations._

/** Gates for the validation tier (q112/q113): the oracle hash proves the
  * clean-corpus report; these specs prove the checks actually FIRE on
  * dirty data and that the suite stays a single-scan plan. */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf001

  test("q112: clean corpus passes every check, one scan only") {
    val report = q112(dir)
    assert(report.count() == 6)
    assert(report.filter(!col("pass")).count() == 0)
    val plan = AuditQueries.q112Expectations(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expectations suite must read the table once, saw $scans scans")
  }

  private def q112(d: String) = AuditQueries.q112Expectations(spark, d)

  test("expectations detect each violation class with exact counts") {
    import spark.implicits._
    // (doc_id, text, lang, n_chars): one dup id, one null text, two bad
    // langs, one negative n_chars, one n_chars/text mismatch
    val dirty = Seq(
      (1L, "ab", "en", 2L),
      (1L, "abc", "en", 3L), // dup doc_id
      (2L, null.asInstanceOf[String], "en", 0L), // null text (also mismatch)
      (3L, "abcd", "xx", 4L), // bad lang
      (4L, "ab", "yy", -2L), // bad lang + negative + mismatch
      (5L, "abcde", "de", 4L) // mismatch
    ).toDF("doc_id", "text", "lang", "n_chars")
    val rep = Expectations.run(dirty, Seq(
        notNull("doc_id"), unique("doc_id"), notNull("text"),
        inSet("lang", Seq("en", "es", "de", "fr", "zh")),
        nonNegative("n_chars"),
        holds("chars_match", col("n_chars") === length(col("text")))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep("not_null(doc_id)") == 0L)
    assert(rep("unique(doc_id)") == 1L)
    assert(rep("not_null(text)") == 1L)
    assert(rep("in_set(lang)") == 2L)
    assert(rep("non_negative(n_chars)") == 1L)
    assert(rep("chars_match") == 3L) // null text row counts as a violation
  }

  test("q113: star-schema integrity holds on the testdata") {
    val audit = AuditQueries.q113FkAudit(spark, dir).collect()
    assert(audit.length == 5)
    assert(audit.forall(_.getAs[Boolean]("pass")),
      audit.filterNot(_.getAs[Boolean]("pass")).mkString(", "))
    assert(audit.forall(_.getAs[Long]("children") > 0))
  }

  test("q114: deciles conserve the corpus and split each source evenly") {
    val docs = Tables.load(spark, dir, "documents")
    val drift = AuditQueries.q114DriftMonitor(spark, dir)
    assert(drift.agg(sum("n_docs")).first().getLong(0) == docs.count())
    // every source with >= 10 docs fills all 10 deciles, sizes n or n+1
    val bad = drift.groupBy("source")
      .agg(countDistinct("decile").as("k"),
        (max("n_docs") - min("n_docs")).as("spread"),
        sum("n_docs").as("tot"))
      .filter(col("tot") >= 10 && (col("k") =!= 10 || col("spread") > 1))
      .count()
    assert(bad == 0L)
    assert(drift.filter(col("drift") < 0).count() == 0L)
  }

  test("q115: partitions conserve vectors and a corrupt vector is flagged") {
    import spark.implicits._
    val report = AuditQueries.q115VectorOutliers(spark, dir)
    val total = Tables.load(spark, dir, "embeddings").count()
    assert(report.agg(sum("n")).first().getLong(0) == total)
    assert(report.filter(col("n_out3") > col("n_out2")).count() == 0L)
    // a mis-scaled vector must land in the 3-sigma bucket
    val clean = (1 to 40).map(i =>
      (0, Array.fill(4)(1.0f + (i % 5) * 0.01f)))
    val dirty = clean :+ ((0, Array.fill(4)(100.0f)))
    val rep = AuditQueries.vectorOutliers(dirty.toDF("label", "embedding"))
      .first()
    assert(rep.getAs[Long]("n_out3") == 1L, rep.toString)
  }

  test("keySkew surfaces a planted hot key with exact stats") {
    import spark.implicits._
    // 9 singleton keys + one key with 91 rows: mean 10, skew 9.1
    val rows = (1 to 9).map(i => s"k$i") ++ Seq.fill(91)("hot")
    val skew = AuditQueries.keySkew(rows.toDF("k"), "k", "t").first()
    assert(skew.getAs[Long]("n_keys") == 10L)
    assert(skew.getAs[Double]("mean_cnt") == 10.0)
    assert(skew.getAs[Long]("max_cnt") == 91L)
    assert(skew.getAs[Double]("skew") == 9.1)
    assert(skew.getAs[String]("top_key") == "hot")
  }

  test("q122: cluster stats conserve the corpus and margin is consistent") {
    val rows = AuditQueries.q122ClusterStats(spark, dir).collect()
    val e = Tables.load(spark, dir, "embeddings")
    assert(rows.map(_.getAs[Long]("n")).sum == e.count())
    assert(rows.map(_.getAs[Int]("label")).toSet ==
      e.select("label").distinct().collect().map(_.getInt(0)).toSet)
    rows.foreach { r =>
      val (coh, near, margin) = (r.getAs[Double]("cohesion"),
        r.getAs[Double]("nearest_sim"), r.getAs[Double]("margin"))
      assert(coh >= -1.0 && coh <= 1.0 && near >= -1.0 && near <= 1.0)
      assert(math.abs(margin - BigDecimal(coh - near)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // the audit's verdict on this fixture is honest: the synthetic
    // labels are weakly clustered (q98's np1 recall ~0.26 says the
    // same), so at least one label's margin must be non-positive —
    // a report claiming clean separation here would be lying
    assert(rows.exists(_.getAs[Double]("margin") <= 0.0))
  }

  test("clusterStats separates planted-tight labels and flags overlap") {
    import spark.implicits._
    // labels 0/1: tight, orthogonal-ish directions; label 2: a copy of
    // label 0's cloud (full overlap)
    val rows =
      (1 to 20).map(i => (0, Array(1.0f, 0.01f * i, 0.0f, 0.0f))) ++
      (1 to 20).map(i => (1, Array(0.0f, 0.01f * i, 1.0f, 0.0f))) ++
      (1 to 20).map(i => (2, Array(1.0f, 0.011f * i, 0.0f, 0.0f)))
    val rep = AuditQueries.clusterStats(rows.toDF("label", "embedding"))
      .collect().map(r => r.getInt(0) ->
        ((r.getAs[Double]("cohesion"), r.getAs[Double]("margin")))).toMap
    // tight + distinct => strongly positive margin for label 1
    assert(rep(1)._2 > 0.25, rep.toString)
    // labels 0 and 2 overlap almost perfectly => margin ~ 0 or negative
    assert(rep(0)._2 < 0.01 && rep(2)._2 < 0.01, rep.toString)
    assert(rep.values.forall(_._1 > 0.9)) // every cloud is itself tight
    // single-label corpus: the audit still reports the cohesion row
    // (null separation), never an empty frame
    val solo = AuditQueries.clusterStats(
      (1 to 10).map(i => (0, Array(1.0f, 0.01f * i, 0.0f, 0.0f)))
        .toDF("label", "embedding")).collect()
    assert(solo.length == 1 && solo.head.getAs[Long]("n") == 10L)
    assert(solo.head.isNullAt(solo.head.fieldIndex("margin")))
  }

  test("fkEdge counts orphans exactly and ignores null child keys") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk") // dup parent must not multiply
    val row = AuditQueries.fkEdge("t", child, "fk", parent, "pk").first()
    assert(row.getAs[Long]("children") == 4L) // null child key ignored
    assert(row.getAs[Long]("orphans") == 1L) // only the 9
    assert(!row.getAs[Boolean]("pass"))
  }
}
