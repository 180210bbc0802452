package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mega-cluster probe: the corpus regime the all-pairs LSH join cannot
  * survive, measured against the star path that ships in its place.
  *
  * Real crawls carry near-identical TEMPLATE clusters of 10⁵-10⁶
  * members (boilerplate pages). Such a cluster shares every LSH band
  * value by construction, so the within-bucket all-pairs join (q21b)
  * emits Θ(m²) candidate rows per band — ~2×10¹⁰ for m = 100k, before
  * any verify can drop one — while the star generator (q133) emits
  * O(m). This probe:
  *
  *   1. synthesizes N docs with ONE planted mega-cluster of M
  *      near-identical members (pairwise J ≈ 0.92) plus a unique tail;
  *   2. COMPUTES (never materializes) the all-pairs candidate volume
  *      from per-bucket occupancy — the number the quadratic path
  *      would have to join;
  *   3. times the star pair-gen (q133) and the full star verdict
  *      (q134) cold, end to end, asserting the mega-cluster resolves
  *      essentially whole (one keeper, ≥97% of members in one
  *      cluster — ~1.4% are isolated by LSH itself: a member whose
  *      unique-token shingles win all 4 bands shares no bucket);
  *   4. at a small config where the quadratic path still completes
  *      (interleaved reps, min per path — host IO swings between
  *      runs), measures all-pairs vs star pair-gen head to head so the
  *      blowup is a measured curve, not only arithmetic.
  *
  * Timings are COLD (each stage re-reads on-disk parquet).
  *
  * Usage: runMain graft.StarScaleProbe [nDocs] [megaSize]
  *   (needs SPARK_DRIVER_MEM=64g at the 10M default — see
  *   .claude/skills/verify/SKILL.md)
  */
object StarScaleProbe {

  /** N docs at `dir/documents.parquet`: ids < mega are copies of one
    * ~25-token template, each with ONE unique appended token (any two
    * members share 23 of their 25 distinct shingles → J ≈ 0.92, past
    * the 0.8 verify gate); the tail is per-doc-unique text. */
  private def writeMegaCorpus(spark: SparkSession, n: Long, mega: Long,
      cpus: Int, dir: String): Double = {
    val t0 = System.nanoTime()
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr(s"CASE WHEN id < $mega THEN CAST(-1 AS BIGINT) ELSE id END")
          .as("base"))
      .select(col("doc_id"),
        concat(
          array_join(expr(
            """transform(sequence(1, 25),
               i -> concat('w', pmod(hash(base * 1009 + i), 5000)))"""), " "),
          expr(s"CASE WHEN doc_id < $mega THEN concat(' x', doc_id) " +
            "ELSE '' END")).as("text"),
        expr("concat('l', pmod(hash(doc_id), 5))").as("lang"),
        expr("concat('s', pmod(hash(doc_id), 7))").as("source"))
      .repartition(cpus)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val mega = if (args.length > 1) args(1).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def prog(stage: String, sec: Double, rows: Long): Unit =
      System.err.println(f"[probe] $stage%-18s $sec%8.1f s  rows=$rows")
    def cold[T](body: => (Double, T)): (Double, T) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      body
    }
    def timedCount(df: => DataFrame): (Double, Long) = {
      val t = System.nanoTime()
      val rows = df.count()
      ((System.nanoTime() - t) / 1e9, rows)
    }

    val dir = java.nio.file.Files.createTempDirectory("star_probe").toString
    val genSec = writeMegaCorpus(spark, n, mega, cpus.toInt, dir)
    prog("gen", genSec, n)

    // (2) the all-pairs candidate volume, COMPUTED from occupancy:
    // sum over buckets of C(m,2) = exactly the rows q21b's self-join
    // would emit before its groupBy. One linear pass over the bands.
    val (occSec, allPairsRows) = cold {
      val t = System.nanoTime()
      val rows = DedupQueries.minhashFastBands(spark, dir)
        .groupBy("bucket").count()
        .agg(sum(expr("count * (count - 1) DIV 2")).as("tot"))
        .head().getLong(0)
      ((System.nanoTime() - t) / 1e9, rows)
    }
    prog("allpairs_computed", occSec, allPairsRows)
    require(allPairsRows >= mega * (mega - 1) / 2 * 9 / 10,
      s"mega cluster failed to collide: $allPairsRows computed rows")

    // (3a) star pair-gen, cold end to end
    val (starSec, starPairs) = cold(timedCount(
      DedupQueries.q133MinhashStar(spark, dir)))
    prog("star_pairs", starSec, starPairs)
    require(starPairs <= 4 * n,
      s"star candidates not linear: $starPairs")

    // (3b) the full star verdict, cold end to end — the CurationRun
    // above-threshold path
    val (verdictSec, verdictRows) = cold {
      val t = System.nanoTime()
      val v = DedupQueries.q134DedupVerdictStar(spark, dir)
        .localCheckpoint(true)
      val rows = v.count()
      val sec = (System.nanoTime() - t) / 1e9
      val biggest = v.filter(col("doc_id") < mega)
        .groupBy("cluster_id").count().agg(max("count"))
        .head().getLong(0)
      val megaKeeps = v.filter(col("doc_id") < mega && col("keep")).count()
      val clusters = v.filter(col("doc_id") < mega)
        .select("cluster_id").distinct().count()
      require(rows == n, s"verdict rows $rows != $n")
      require(biggest >= mega * 97 / 100,
        s"mega cluster shattered: biggest=$biggest of $mega")
      require(megaKeeps == clusters,
        s"keepers $megaKeeps != clusters $clusters")
      System.err.println(
        s"[probe] mega resolved: biggest=$biggest clusters=$clusters " +
          s"keeps=$megaKeeps")
      (sec, rows)
    }
    prog("star_verdict", verdictSec, verdictRows)

    // (4) measured head-to-head where all-pairs still completes:
    // 200k docs, 10k-member cluster (~2×10⁸ all-pairs rows).
    // Interleaved reps (A,B,A,B), min per path — single-ordering runs
    // read host IO swings as path differences.
    val smallN = math.min(n, 200000L)
    val smallMega = math.min(mega, 10000L)
    val dir2 = java.nio.file.Files.createTempDirectory("star_probe2").toString
    writeMegaCorpus(spark, smallN, smallMega, cpus.toInt, dir2)
    var allMin = Double.MaxValue
    var starMin = Double.MaxValue
    var allPairsSmall = 0L
    var starSmall = 0L
    (1 to 2).foreach { _ =>
      val (aSec, aRows) = cold(timedCount(
        DedupQueries.q21bMinhashFast(spark, dir2)))
      allMin = math.min(allMin, aSec); allPairsSmall = aRows
      val (sSec, sRows) = cold(timedCount(
        DedupQueries.q133MinhashStar(spark, dir2)))
      starMin = math.min(starMin, sSec); starSmall = sRows
      prog("head2head_rep", aSec + sSec, aRows + sRows)
    }
    prog("allpairs_small", allMin, allPairsSmall)
    prog("star_small", starMin, starSmall)
    require(allPairsSmall >= smallMega * (smallMega - 1) / 2 * 9 / 10,
      s"small config lost its quadratic regime: $allPairsSmall")

    println(
      s"""{"metric":"star_scale_probe","n_docs":$n,"mega":$mega,""" +
        s""""gen_sec":${f"$genSec%.1f"},""" +
        s""""allpairs_candidate_rows_computed":$allPairsRows,""" +
        s""""star_pairs":$starPairs,"star_pairs_sec":${f"$starSec%.1f"},""" +
        s""""star_verdict_sec":${f"$verdictSec%.1f"},""" +
        s""""small_n":$smallN,"small_mega":$smallMega,""" +
        s""""small_allpairs_rows":$allPairsSmall,""" +
        s""""small_allpairs_sec":${f"$allMin%.1f"},""" +
        s""""small_star_rows":$starSmall,""" +
        s""""small_star_sec":${f"$starMin%.1f"}}""")
    spark.stop()
  }
}
