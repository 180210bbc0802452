package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Viral-image probe: StarScaleProbe's media leg. ONE image re-uploaded
  * M times (the meme/template case — byte-identical payloads, identical
  * pHash, hamming 0) shares every band bucket by construction, so the
  * all-pairs banded hamming join emits Θ(M²) candidate rows while
  * [[graft.functions.mm.phashPairs]]'s star mode emits O(M).
  *
  *   1. synthesizes N media blobs, ids < M all from ONE base id
  *      (byte-identical), the tail per-id unique;
  *   2. COMPUTES (never materializes) the all-pairs candidate volume
  *      from per-(band, value) occupancy over the same 5-band split
  *      the radius-4 join uses;
  *   3. times star pair-gen cold end to end (decode + DCT + banding +
  *      star join), asserting exactly the M−1 hamming-0 edges for the
  *      cluster and WHOLE-cluster resolution through connected
  *      components — the loss-free case the phashPairs scaladoc argues;
  *   4. head-to-head at a small config where all-pairs still completes
  *      (interleaved reps, min per path).
  *
  * Usage: runMain graft.MediaStarProbe [nBlobs] [megaSize]
  */
object MediaStarProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val mega = if (args.length > 1) args(1).toLong else 100000L
    require(n >= 1000 && mega >= 2 && mega <= n,
      s"degenerate probe: n=$n mega=$mega")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.mm

    def media(count: Long, m: Long): DataFrame = spark.range(count)
      .select(col("id").as("doc_id"),
        expr(s"CASE WHEN id < $m THEN 0L ELSE id END").as("base"))
      .select(col("doc_id"),
        mm.synthesize_media(col("base"), lit(0), lit(2048)).as("bytes"))
    def cold[T](body: => T): T = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      body
    }
    def timedCount(df: => DataFrame): (Double, Long) = {
      val t = System.nanoTime()
      val rows = df.count()
      ((System.nanoTime() - t) / 1e9, rows)
    }
    def prog(stage: String, sec: Double, rows: Long): Unit =
      System.err.println(f"[probe] $stage%-18s $sec%8.1f s  rows=$rows")

    // (2) all-pairs candidate volume, computed from band occupancy over
    // the radius-4 split ((13,13,13,13,12)-bit bands of the 64-bit
    // pHash) — exactly the rows the star=false self-join would emit
    val widths = Seq(13, 13, 13, 13, 12)
    val offs = widths.scanLeft(0)(_ + _)
    val (occSec, allPairsRows) = cold {
      val t = System.nanoTime()
      val sig = media(n, mega)
        .select(col("doc_id"), mm.phash64(col("bytes")).as("v"))
      val rows = sig.select(col("doc_id"),
          explode(array(widths.indices.map { i =>
            struct(lit(i).as("band"),
              shiftrightunsigned(col("v"), offs(i))
                .bitwiseAND(lit((1L << widths(i)) - 1)).as("bval"))
          }: _*)).as("bk"))
        .groupBy("bk.band", "bk.bval").count()
        .agg(coalesce(sum(expr("count * (count - 1) DIV 2")), lit(0L)))
        .head().getLong(0)
      ((System.nanoTime() - t) / 1e9, rows)
    }
    prog("allpairs_computed", occSec, allPairsRows)
    require(allPairsRows >= mega * (mega - 1) / 2 * 5,
      s"viral cluster failed to share its buckets: $allPairsRows")

    // (3) star pair-gen cold end to end, then whole-cluster resolution
    val (starSec, starPairs) = cold(timedCount(
      mm.phashPairs(media(n, mega), "doc_id", "bytes", 4, star = true)))
    prog("star_pairs", starSec, starPairs)
    // the CLUSTER's edge set must be exactly its M-1 star edges, every
    // one anchored at the global-min member (doc 0) at hamming 0 — the
    // synthetic unique blobs legitimately contribute their own
    // near-dup pairs on top (structured payloads → close pHashes), so
    // the linearity claim is asserted on the cluster's own edges, not
    // the total
    val pinned = mm.phashPairs(media(n, mega), "doc_id", "bytes", 4, star = true)
      .localCheckpoint(true)
    val cl = pinned.filter(col("doc_b") < mega)
      .agg(count(lit(1)),
        sum(when(col("doc_a") =!= 0L || col("hamming") =!= 0, 1L)
          .otherwise(0L))).head()
    require(cl.getLong(0) == mega - 1 && cl.getLong(1) == 0,
      s"cluster edges not the O(M) star: n=${cl.getLong(0)} bad=${cl.getLong(1)}")
    val comps = graft.operators.DedupOps.connectedComponents(
      pinned.select("doc_a", "doc_b"), "doc_a", "doc_b")
    val biggest = comps.groupBy("comp").count().agg(max("count"))
      .head().getLong(0)
    require(biggest >= mega,
      s"viral cluster did not resolve whole: biggest=$biggest of $mega")
    System.err.println(s"[probe] cluster resolved whole: biggest=$biggest " +
      s"(>= $mega planted)")

    // (4) head-to-head where all-pairs still completes
    val smallN = math.min(n, 50000L)
    val smallMega = math.min(mega, 5000L)
    var allMin = Double.MaxValue; var starMin = Double.MaxValue
    var allRows = 0L; var starRows = 0L
    // record EVERY rep's wall, not just the min (EventSkewProbe's
    // convention, r15 verdict candidate (c)): future drift disputes on
    // the media path resolve from the emitted ledger, not a re-run
    val allReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val starReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 2).foreach { _ =>
      val (aSec, aRows) = cold(timedCount(
        mm.phashPairs(media(smallN, smallMega), "doc_id", "bytes", 4,
          star = false)))
      allMin = math.min(allMin, aSec); allRows = aRows; allReps += aSec
      val (sSec, sRows) = cold(timedCount(
        mm.phashPairs(media(smallN, smallMega), "doc_id", "bytes", 4,
          star = true)))
      starMin = math.min(starMin, sSec); starRows = sRows; starReps += sSec
      prog("head2head_rep", aSec + sSec, aRows + sRows)
    }
    prog("allpairs_small", allMin, allRows)
    prog("star_small", starMin, starRows)
    require(allRows >= smallMega * (smallMega - 1) / 2,
      s"small config lost its quadratic regime: $allRows")

    println(
      s"""{"metric":"media_star_probe","n_blobs":$n,"mega":$mega,""" +
        s""""allpairs_candidate_rows_computed":$allPairsRows,""" +
        s""""star_pairs":$starPairs,"star_pairs_sec":${f"$starSec%.1f"},""" +
        s""""biggest_component":$biggest,""" +
        s""""small_n":$smallN,"small_mega":$smallMega,""" +
        s""""small_allpairs_rows":$allRows,""" +
        s""""small_allpairs_sec":${f"$allMin%.1f"},""" +
        s""""small_allpairs_reps":${allReps.map(r => f"$r%.1f").mkString("[", ",", "]")},""" +
        s""""small_star_rows":$starRows,""" +
        s""""small_star_sec":${f"$starMin%.1f"},""" +
        s""""small_star_reps":${starReps.map(r => f"$r%.1f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
