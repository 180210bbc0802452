package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WeightedSample

class WeightedSampleSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  /** 2000 rows in 2 groups; 10% carry weight 10, the rest weight 1. */
  private def pop = spark.range(2000).select(
    col("id"),
    (col("id") % 2).cast("string").as("grp"),
    when(col("id") % 10 === 0, lit(10.0)).otherwise(lit(1.0)).as("w"))

  test("exact k rows per group, deterministic under the same seed") {
    def run() = WeightedSample
      .exactKPerGroup(pop, col("grp"), col("id"), col("w"), k = 100, seed = 7)
      .select("id").as[Long].collect().toSet
    val a = run()
    assert(a.size == 200) // 100 per group, ids unique across groups
    assert(run() == a, "same seed must reproduce the same sample")
    val b = WeightedSample
      .exactKPerGroup(pop, col("grp"), col("id"), col("w"), k = 100, seed = 8)
      .select("id").as[Long].collect().toSet
    assert(b != a, "a different seed should move the sample")
  }

  test("the sampler never windows over a group: bounded aggregate + semi join") {
    // a corpus-scale group must not funnel through one task's sort —
    // the winner set comes from the partial TopKAgg, so the plan has
    // NO WindowExec at all (and the aggregate runs partial+final)
    val plan = WeightedSample
      .exactKPerGroup(pop, col("grp"), col("id"), col("w"), 10, seed = 2)
      .queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"group window crept back:\n$plan")
    // the winner set is gateBroadcast-pinned before the join, so its
    // aggregate runs in its own query — pin the partial+final modes on
    // the same TopKAgg shape the sampler builds
    val aggPlan = pop
      .groupBy("grp")
      .agg(graft.functions.gf.top_k_by(col("w"), col("id"), 10).as("_tk"))
      .queryExecution.sparkPlan
    val modes = aggPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.aggregateExpressions.map(_.mode.toString)
    }.flatten
    assert(modes.contains("Partial") && modes.contains("Final"),
      s"top-k must partial-aggregate map-side, saw: $modes")
  }

  test("lossy row-id types are rejected fast, not silently mis-sampled") {
    // a fractional double collides under a long cast and a binary blob
    // is lossy as UTF-8 — the winner join keys on the id's NATIVE type
    // (integral or string), and anything else must say so loudly
    val dblIds = pop.withColumn("did", col("id") + lit(0.5))
    val e = intercept[IllegalArgumentException] {
      WeightedSample.exactKPerGroup(dblIds, col("grp"), col("did"),
        col("w"), 10, seed = 1)
    }
    assert(e.getMessage.contains("native"), e.getMessage)
  }

  test("string row ids (URL-keyed corpora) sample natively: exact k, deterministic") {
    // the r10 restriction forced URL/hash-keyed crawls through a
    // pre-mapping to longs; the winner semi join now keys on the
    // string itself
    val strPop = pop.withColumn("url",
      concat(lit("https://ex.com/"), col("grp"), lit("/p"), col("id")))
    def run(seed: Long) = WeightedSample
      .exactKPerGroup(strPop, col("grp"), col("url"), col("w"), 100, seed)
      .select("url").as[String].collect().toSet
    val a = run(7)
    assert(a.size == 200, s"exact k per group: ${a.size}")
    assert(run(7) == a, "same seed must reproduce the same sample")
    assert(run(8) != a, "a different seed should move the sample")
    // no group window on the string path either
    val plan = WeightedSample
      .exactKPerGroup(strPop, col("grp"), col("url"), col("w"), 10, seed = 2)
      .queryExecution.sparkPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"group window crept back on the string path:\n$plan")
  }

  test("string row ids: partitioning does not change the sample") {
    val strPop = pop.withColumn("url",
      concat(lit("https://ex.com/"), col("grp"), lit("/p"), col("id")))
    val a = WeightedSample
      .exactKPerGroup(strPop, col("grp"), col("url"), col("w"), 50, seed = 3)
      .select("url").as[String].collect().toSet
    val b = WeightedSample
      .exactKPerGroup(strPop.repartition(17, col("id")), col("grp"),
        col("url"), col("w"), 50, seed = 3)
      .select("url").as[String].collect().toSet
    assert(a == b)
  }

  test("partitioning does not change the sample") {
    val shuffled = pop.repartition(17, col("id"))
    val a = WeightedSample
      .exactKPerGroup(pop, col("grp"), col("id"), col("w"), 50, seed = 3)
      .select("id").as[Long].collect().toSet
    val b = WeightedSample
      .exactKPerGroup(shuffled, col("grp"), col("id"), col("w"), 50, seed = 3)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("heavier rows are sampled at a visibly higher rate") {
    // weight-10 rows are 10% of the population; across 5 seeds they
    // should hold a clear majority-above-proportional share of the
    // sample (A-ES inclusion odds rise with weight)
    val fracs = (1 to 5).map { seed =>
      val got = WeightedSample
        .exactKPerGroup(pop, col("grp"), col("id"), col("w"), 100, seed)
      got.filter(col("w") === 10.0).count().toDouble / got.count()
    }
    val mean = fracs.sum / fracs.size
    assert(mean > 0.3, s"heavy fraction $mean should far exceed the 0.1 share")
    assert(mean < 0.95, s"light rows must still appear: $mean")
  }

  test("short and zero-weight groups degrade safely") {
    val tiny = Seq((1L, "a", 2.0), (2L, "a", 1.0), (3L, "b", 0.0))
      .toDF("id", "grp", "w")
    val got = WeightedSample
      .exactKPerGroup(tiny, col("grp"), col("id"), col("w"), 5, seed = 1)
      .select("id").as[Long].collect().toSet
    // group a returns all its rows; the zero-weight row is never sampled
    assert(got == Set(1L, 2L))
  }

  test("q85 Bernoulli twin lands near its expected size with exact weights") {
    val got = CurationQueries.q85WeightedSample(spark, SparkSuite.sf001)
    val n = got.count()
    assert(n > 100 && n < 300, s"expected ~200 sampled docs, got $n")
    // w must be the document's n_chars, untouched
    val joined = got.join(
      Tables.load(spark, SparkSuite.sf001, "documents")
        .select(col("doc_id"), col("n_chars")),
      "doc_id")
    assert(joined.filter(col("w") =!= col("n_chars")).count() == 0)
  }
}
