package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the sketch-based operators (no DuckDB oracle — estimates
  * are engine-specific): accuracy against the exact computation and the
  * partial-merge plan shape that makes them the 100 TB path. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("q80 HLL distinct-fp estimate within 2% of exact, per source") {
    val approx = CurationQueries
      .q80CardinalitySketch(spark, SparkSuite.sf001)
      .select("source", "n_docs", "approx_distinct", "dup_frac")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = Tables.load(spark, SparkSuite.sf001, "documents")
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), countDistinct("fp").as("d"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, (n, d)) =>
      val (an, ad, frac) = approx(src)
      assert(an == n, s"$src raw count must be exact")
      val err = math.abs(ad - d).toDouble / d
      assert(err < 0.02, s"$src: approx $ad vs exact $d (err $err)")
      assert(math.abs(frac - (1.0 - ad.toDouble / an)) < 1e-9)
    }
  }

  test("q80 sketch aggregates partially before the exchange") {
    val plan = CurationQueries
      .q80CardinalitySketch(spark, SparkSuite.sf001)
      .queryExecution.executedPlan.toString
    // HLL++ buffers merge map-side: partial_approx_count_distinct must
    // sit BELOW the source-key exchange (deeper = later in the printed
    // tree), so the shuffle carries |sources| fixed-width sketches per
    // task, never per-row fingerprints
    val exch = plan.indexOf("Exchange hashpartitioning(source")
    val partial = plan.indexOf("partial_approx_count_distinct")
    assert(exch > 0 && partial > exch, plan.take(2000))
  }

  test("q80 estimate is deterministic across runs") {
    def run() = CurationQueries.q80CardinalitySketch(spark, SparkSuite.sf001)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }

  test("q81 quantiles honor the GK rank-error guarantee, per language") {
    val approx = CurationQueries
      .q81LengthQuantiles(spark, SparkSuite.sf001)
      .collect().map(r => r.getString(0) ->
        Seq(r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val exact = Tables.load(spark, SparkSuite.sf001, "documents")
      .select(col("lang"), graft.functions.gf.token_count(col("text")).as("toks"))
      .collect().groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getInt(1)).sorted }
    assert(approx.keySet == exact.keySet)
    for ((lang, sorted) <- exact; (p, got) <- Seq(0.5, 0.9, 0.99).zip(approx(lang))) {
      val n = sorted.length
      // GK guarantee: the returned value's rank is within n/accuracy of
      // the target rank (plus the discretization of one element)
      val lo = sorted.count(_ < got).toDouble / n
      val hi = sorted.count(_ <= got).toDouble / n
      val tol = 1.0 / 10000 + 1.0 / n
      assert(p >= lo - tol && p <= hi + tol,
        s"$lang p$p: got $got rank [$lo,$hi] n=$n")
    }
  }

  test("q81 sketch aggregates partially before the exchange") {
    val plan = CurationQueries
      .q81LengthQuantiles(spark, SparkSuite.sf001)
      .queryExecution.executedPlan.toString
    val exch = plan.indexOf("Exchange hashpartitioning(lang")
    val partial = plan.indexOf("partial_percentile_approx")
    assert(exch > 0 && partial > exch, plan.take(2000))
  }
}
