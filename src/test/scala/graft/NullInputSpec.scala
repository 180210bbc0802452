package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must survive NULL values in nullable payload
  * columns (text/lang/source, event props/value) — production corpora
  * always contain them, the synthetic testdata never does, and a Scala
  * UDF given a null String throws NPE unless explicitly guarded. */
class NullInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Testdata twin where every third document's text (and some lang /
    * source / props values) is NULL. */
  private lazy val nulledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("sfnull").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      val raw = spark.read.parquet(s"${SparkSuite.sf0001}/$t.parquet")
      val out = t match {
        case "documents" => raw
          .withColumn("text", when(col("doc_id") % 3 === 0, lit(null: String))
            .otherwise(col("text")))
          .withColumn("lang", when(col("doc_id") % 5 === 0, lit(null: String))
            .otherwise(col("lang")))
          .withColumn("source", when(col("doc_id") % 7 === 0, lit(null: String))
            .otherwise(col("source")))
        case "events" => raw
          .withColumn("props", when(col("event_id") % 4 === 0, lit(null: String))
            .otherwise(col("props")))
        case _ => raw
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name survives null payload values") {
      val rows = fn(spark, nulledDir).collect()
      assert(rows != null)
    }
  }

  test("q105 reports a verdict for EVERY doc, null-text/null-fp included") {
    // a null-text doc passes the gate chain (every `when` evaluates to
    // null, not true) and lands in the dedup stage with fp = NULL — the
    // keeper join must be null-safe or the doc silently vanishes from a
    // report whose contract is per-document provenance
    val docs = Tables.load(spark, nulledDir, "documents")
    val n = docs.count()
    val report = PipelineQueries.q105RejectionReport(spark, nulledDir)
    assert(report.count() == n,
      "the rejection report must carry exactly one verdict per document")
    assert(report.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("q59/q132 pack offsets keep null-lang docs (null-safe leg join)") {
    // groupBy/PARTITION BY treat NULL as an ordinary group; the
    // range-exchange prefix sum's join-back must too (a using-join
    // drops null keys) — token conservation is the detector
    val docs = Tables.load(spark, nulledDir, "documents")
    val corpusToks = docs
      .select(size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .filter(col("n") > 0 && col("n").isNotNull)
      .agg(sum("n")).head().getLong(0)
    val packed = CurationQueries.packSequences(docs, 64L)
    val packedToks = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(corpusToks == packedToks,
      s"token loss across packing: corpus=$corpusToks packed=$packedToks")
    assert(packed.filter(col("lang").isNull).count() > 0,
      "the null-lang leg must appear in the packed output")
    val plan = CurationQueries.q59PackPlan(spark, nulledDir)
    assert(plan.filter(col("lang").isNull).agg(sum("n_docs")).head().getLong(0) > 0,
      "q59 must plan bins for the null-lang leg")
  }
}
