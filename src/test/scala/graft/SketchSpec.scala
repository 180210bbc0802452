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

  /** Skewed synthetic stream: 5 hot items (~8% each) over a 2000-key
    * uniform tail — hot items sit far above the n/(k+1) threshold at
    * k=19, the tail far below, with seeded determinism. */
  private def skewedStream(seed: Int, n: Int): IndexedSeq[String] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(n) {
      if (rnd.nextInt(100) < 40) s"hot${rnd.nextInt(5)}"
      else s"cold${rnd.nextInt(2000)}"
    }
  }

  test("MisraGries keeps every item above n/(k+1) and undercounts by at most it") {
    val stream = skewedStream(seed = 42, n = 20000)
    val k = 19
    val mg = new graft.functions.MisraGries(k).addAll(stream.iterator)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val thr = stream.size.toDouble / (k + 1)
    val est = mg.estimates
    assert(mg.n == stream.size && est.size <= k)
    for ((x, f) <- exact if f > thr)
      assert(est.contains(x), s"frequent item $x (freq $f > $thr) missing")
    for ((x, e) <- est) {
      val f = exact(x)
      assert(e <= f, s"$x overcounted: est $e > true $f")
      assert(f - e <= thr, s"$x undercount ${f - e} exceeds bound $thr")
    }
  }

  test("MisraGries merge preserves both bounds at the combined n") {
    val stream = skewedStream(seed = 7, n = 30000)
    val k = 19
    // build 7 independent summaries over uneven slices, merge left-fold
    val parts = stream.grouped(4567).toSeq
    val merged = parts.map(p => new graft.functions.MisraGries(k)
        .addAll(p.iterator))
      .reduceLeft((a, b) => a.merge(b))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val thr = stream.size.toDouble / (k + 1)
    val est = merged.estimates
    assert(merged.n == stream.size && est.size <= k)
    for ((x, f) <- exact if f > thr)
      assert(est.contains(x), s"frequent item $x lost in merge")
    for ((x, e) <- est)
      assert(e <= exact(x) && exact(x) - e <= thr,
        s"$x: est $e vs true ${exact(x)} bound $thr")
  }

  test("q83 sketch-pruned frequent tokens equal the exact threshold aggregate") {
    val got = CurationQueries.q83FrequentTokens(spark, SparkSuite.sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val toks = Tables.load(spark, SparkSuite.sf001, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val exact = counts.filter { case (_, f) => f * 32 > n }
    assert(got.keySet == exact.keySet,
      s"got ${got.keySet.size} tokens, exact ${exact.size}")
    for ((tok, f) <- exact) {
      assert(got(tok)._1 == f)
      assert(math.abs(got(tok)._2 - (f.toDouble / n)) < 1e-6 + 1e-9)
    }
    assert(got.nonEmpty, "threshold must bite on the test corpus")
  }
}
