package graft

import org.apache.spark.sql.SparkSession

/** MaxSim candidate-budget calibration — the measured knob table for
  * the two-stage retrieve-then-rerank budget ([[RetrievalQueries
  * .maxsimIvf]]), the nprobe_cal pattern applied to late interaction:
  * recall@5 of the IVF-candidate pipeline against brute-force MaxSim
  * over a 16-query-doc panel at a (nprobe, candK) grid, with
  * wall-clocks. A document can rank on SUMMED chunk affinity without
  * any single chunk reaching the top-candK, so the budget trades
  * recall explicitly — this probe is where that tradeoff gets numbers
  * instead of folklore.
  *
  * Usage: runMain graft.MaxsimCalProbe [sfDir]
  */
object MaxsimCalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nq = 16
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap

    val brute = topSets(RetrievalQueries.maxsimBrute(spark, dir, nq))
    // ONE index build for the whole grid: each cell times only the
    // candidate search + rerank — the budget cost the probe exists to
    // measure — not a repeated k-means
    val e = RetrievalQueries.chunkFrameFor(spark, dir)
    val (idx, model) = graft.index.IvfIndex.build(e, "embedding",
      graft.index.IvfIndex.Params(listSize = 100, sampleSize = 50000))
    val cached = idx.persist()
    cached.count()
    def cell(np: Int, ck: Int): Map[Long, Set[Long]] =
      topSets(RetrievalQueries.maxsimIvfWith(e, cached, model, np, ck, nq))
    val cells = for (np <- Seq(1, 2, 4); ck <- Seq(4, 16, 64)) yield {
      val t0 = System.nanoTime()
      val got = cell(np, ck)
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = brute.map { case (q, want) =>
        (got.getOrElse(q, Set.empty) intersect want).size.toDouble / want.size
      }.sum / brute.size
      require(recall > 0.0, s"np=$np ck=$ck retrieved nothing")
      f"""{"nprobe":$np,"cand_k":$ck,"recall5":$recall%.4f,"sec":$sec%.2f}"""
    }
    // sanity: the lossless corner (every list probed, candidate budget
    // >= corpus — nprobe derived unbounded, not a magic constant that a
    // bigger corpus outgrows) must be exact
    val lossless = cell(Int.MaxValue, Int.MaxValue)
    require(lossless == brute, "lossless settings diverged from brute force")
    println(s"""{"probe":"maxsim_cal","n_queries":$nq,"sf":"$dir",""" +
      s""""grid":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
