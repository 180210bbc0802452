package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the two r14 mega-key window rewrites, each measured
  * in its two regimes (the SpineScaleProbe discipline: itemize the
  * small-SF constant the rewrite pays AND the cliff it removes, the
  * day it ships).
  *
  * LEG 1 — q82's first-occurrence span verdict. Window form:
  * `row_number().over(Window.partitionBy(chunk))`; shipped form:
  * min-struct aggregate + merge join-back
  * ([[AnalyticsQueries.spanRemovals]]). FLAT regime: every doc unique
  * (chunk df ≈ 1). VIRAL regime: `megaShare` of docs share one
  * boilerplate 8-token chunk (license header / nav text — the Lee et
  * al. dedup case), making ONE window partition corpus-scale.
  * Identical removal totals asserted per rep.
  *
  * LEG 2 — q69's distribution ranks. Window form: ntile/percent_rank/
  * cume_dist over `Window.partitionBy(lang)`; shipped form:
  * [[graft.operators.RankOps.distributionRanksPer]] (range exchange +
  * broadcast counts). FLAT regime: 100 equal languages. SKEW regime:
  * 90% of rows in one language (PackScaleProbe's measured crawl
  * shape) — one window partition sorts 90% of the corpus in one
  * task. Equality asserted on per-lang aggregate fingerprints
  * (sum of tiles, 4dp-quantized pr/cd sums); exact row equality is
  * RankOpsSpec's job at small scale.
  *
  * Usage: runMain graft.SpanRankScaleProbe [nDocs] [megaShare%]
  */
object SpanRankScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 5000000L
    val megaPct = if (args.length > 1) args(1).toInt else 50
    require(n >= 1000 && megaPct >= 1 && megaPct <= 100,
      s"degenerate probe: n=$n megaPct=$megaPct")
    val mega = n * megaPct / 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def time(body: => Long): (Double, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // ---------- LEG 1: q82 span verdict ----------
    // ~24 tokens/doc → 3 chunks; viral docs START with the shared
    // boilerplate chunk, then a unique tail (so only chunk idx 0 of a
    // viral doc is removable, and exactly mega-1 removals occur in the
    // viral regime beyond the flat baseline's hash collisions)
    def spanCorpus(dir: String, viral: Boolean): Unit = {
      val head =
        if (viral) expr(s"CASE WHEN id < $mega THEN 'the boiler plate nav " +
          s"header all rights reserved' ELSE concat('u', id, ' ', " +
          "array_join(transform(sequence(1, 7), i -> concat('h', " +
          "pmod(hash(id * 31 + i), 1000000000))), ' ')) END")
        else expr("concat('u', id, ' ', array_join(transform(sequence(1, 7)," +
          " i -> concat('h', pmod(hash(id * 31 + i), 1000000000))), ' '))")
      spark.range(n)
        .select(col("id").as("doc_id"),
          concat(head, lit(" "),
            expr("array_join(transform(sequence(1, 16), i -> concat('t', " +
              "id, 'x', i)), ' ')")).as("text"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    def exploded(dir: String): DataFrame = {
      val toks = split(trim(lower(col("text"))), "\\s+")
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          expr("""transform(sequence(0, cast((size(t) - 1) / 8 as int)),
                |  i -> array_join(slice(t, i * 8 + 1, 8), ' '))""".stripMargin)
            .as("ch"))
        .select(col("doc_id"), posexplode(col("ch")).as(Seq("idx", "c")))
    }
    // the pre-r14 window form, kept as the A/B twin
    def windowRemovals(ex: DataFrame): DataFrame = ex
      .withColumn("rn", row_number().over(
        Window.partitionBy("c").orderBy(col("doc_id").asc, col("idx").asc)))
      .filter(col("rn") > 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("idx"))).as("rem"))
    def removalTotal(rems: DataFrame): Long =
      rems.agg(coalesce(sum(size(col("rem"))), lit(0L))).head().getLong(0)

    Seq(("flat", false), ("viral", true)).foreach { case (tag, viral) =>
      val dir = java.nio.file.Files.createTempDirectory(s"span_$tag").toString
      spanCorpus(dir, viral)
      var aggMin = Double.MaxValue; var winMin = Double.MaxValue
      var aggTot = -1L; var winTot = -1L
      (1 to 2).foreach { _ =>
        val (ta, ca) = time(removalTotal(
          AnalyticsQueries.spanRemovals(exploded(dir))))
        val (tw, cw) = time(removalTotal(windowRemovals(exploded(dir))))
        aggMin = math.min(aggMin, ta); winMin = math.min(winMin, tw)
        aggTot = ca; winTot = cw
      }
      require(aggTot == winTot,
        s"span shapes disagree ($tag): agg=$aggTot window=$winTot")
      if (viral) require(aggTot >= mega - 1,
        s"viral regime must remove the planted chunk repeats: $aggTot")
      results(s"span_agg_$tag") = aggMin
      results(s"span_window_$tag") = winMin
      System.err.println(f"[probe] span $tag: agg=$aggMin%.1f s " +
        f"window=$winMin%.1f s removals=$aggTot")
    }

    // ---------- LEG 2: q69 distribution ranks ----------
    def rankRows(skewed: Boolean): DataFrame = {
      val lang =
        if (skewed) expr("CASE WHEN pmod(hash(id), 10) < 9 THEN 'en' " +
          "ELSE concat('l', pmod(hash(id, 3), 9)) END")
        else expr("concat('l', pmod(hash(id), 100))")
      spark.range(n).select(col("id").as("doc_id"), lang.as("lang"),
        pmod(hash(col("id"), lit(5)), lit(20000)).as("n_chars"))
    }
    def fingerprint(df: DataFrame): Map[String, (Long, Long, Long)] =
      df.groupBy("lang")
        .agg(sum(col("tile")).as("st"),
          sum(round(col("pr") * 10000).cast("long")).as("sp"),
          sum(round(col("cd") * 10000).cast("long")).as("sc"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val order = Seq(col("n_chars").asc, col("doc_id").asc)
    Seq(("flat", false), ("skew", true)).foreach { case (tag, skewed) =>
      var aggMin = Double.MaxValue; var winMin = Double.MaxValue
      var fpA: Map[String, (Long, Long, Long)] = Map.empty
      var fpW: Map[String, (Long, Long, Long)] = Map.empty
      (1 to 2).foreach { _ =>
        val (ta, _) = time {
          fpA = fingerprint(graft.operators.RankOps.distributionRanksPer(
            rankRows(skewed), "lang", order, 10, "tile", "pr", "cd"))
          fpA.size.toLong
        }
        val (tw, _) = time {
          val w = Window.partitionBy("lang").orderBy(order: _*)
          fpW = fingerprint(rankRows(skewed)
            .withColumn("tile", ntile(10).over(w))
            .withColumn("pr", percent_rank().over(w))
            .withColumn("cd", cume_dist().over(w)))
          fpW.size.toLong
        }
        aggMin = math.min(aggMin, ta); winMin = math.min(winMin, tw)
      }
      require(fpA == fpW, s"rank shapes disagree ($tag): " +
        s"${(fpA.toSet -- fpW.toSet).take(3)} vs ${(fpW.toSet -- fpA.toSet).take(3)}")
      results(s"rank_agg_$tag") = aggMin
      results(s"rank_window_$tag") = winMin
      System.err.println(f"[probe] rank $tag: agg=$aggMin%.1f s " +
        f"window=$winMin%.1f s langs=${fpA.size}")
    }

    println("""{"metric":"span_rank_scale_probe","n":""" + n +
      s""","mega":$mega,""" +
      results.map { case (k, v) => s""""$k":${f"$v%.1f"}""" }.mkString(",") +
      "}")
    spark.stop()
  }
}
