package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

/** One-pass profiler: exact counts, bounded-error distinct sketches. */
class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("profile of the documents table is accurate in one pass") {
    val docs = Tables.load(spark, SparkSuite.sf001, "documents")
    val prof = Profiler.profile(docs).map(p => p.column -> p).toMap
    val n = docs.count()
    assert(prof("doc_id").nRows == n && prof("doc_id").nNulls == 0)
    // HLL++ distinct within the configured 5% rsd (3 sigma margin)
    val exactIds = docs.select("doc_id").distinct().count()
    assert(math.abs(prof("doc_id").approxDistinct - exactIds) <= exactIds * 0.15)
    val exactLang = docs.select("lang").distinct().count()
    assert(math.abs(prof("lang").approxDistinct - exactLang) <= math.max(1, exactLang * 0.15))
    assert(prof("doc_id").min == "0")
    assert(prof("doc_id").max == (n - 1).toString)
    assert(prof("text").dtype == "string")
  }

  test("nulls are counted") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "v")
    val p = Profiler.profile(df).map(x => x.column -> x).toMap
    assert(p("v").nNulls == 1)
    assert(p("id").nNulls == 0)
  }
}
