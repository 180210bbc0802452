package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift-windows-at-scale probe (q136 / `AuditQueries.driftWindows`):
  * synthesizes an N-doc corpus with a REALISTICALLY SKEWED source
  * distribution (one mega-source holding ~25% of the corpus, 100 mid
  * sources, a 1k-source tail) and wall-clocks the shipped
  * aggregate-first shape against the naive per-DOCUMENT cumulative
  * window — the shape someone "just computing a running mean" writes:
  * `sum(q) over (partition by source order by doc_id)` on raw rows,
  * which funnels the mega-source's quarter of the corpus through ONE
  * sort task before any aggregation. The shipped shape's only
  * corpus-sized stage is a map-side partial aggregate; its window
  * runs over per-(source, bucket) AGGREGATE rows.
  *
  * Results are VERIFIED before anything is timed: both shapes must
  * produce IDENTICAL (source, bucket, n_docs, mean_q, drift) rows —
  * q values are exact binary fractions (k/4) so sums are
  * order-independent and the equality is exact, not toleranced.
  *
  * Timings are COLD (each rep re-reads on-disk parquet), interleaved
  * A/B/A/B with every rep recorded in the emitted JSON, min per shape
  * — single-ordering runs read host IO swings as path differences.
  *
  * Usage: runMain graft.DriftScaleProbe [nDocs]
  *   (needs SPARK_DRIVER_MEM=64g at the 10M default — see
  *   .claude/skills/verify/SKILL.md)
  */
object DriftScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val bucketW = math.max(n / 1000L, 1L) // ~1000 arrival buckets
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def prog(stage: String, sec: Double, rows: Long): Unit =
      System.err.println(f"[probe] $stage%-18s $sec%8.1f s  rows=$rows")
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

    val dir = java.nio.file.Files.createTempDirectory("drift_probe").toString
    var t0 = System.nanoTime()
    spark.range(n)
      .select(col("id").as("doc_id"),
        // skew: 25% mega, 25% across 100 mid sources, 50% across a
        // 1k-source tail — source stays a bounded dimension (the
        // operator's premise, and the realistic crawl regime:
        // hundreds-to-thousands of feeds) while one key carries
        // corpus-scale mass
        expr("""CASE WHEN id % 4 = 0 THEN 'mega'
                WHEN id % 4 = 1 THEN concat('mid', pmod(hash(id), 100))
                ELSE concat('tail', pmod(hash(id * 31), 1000))
                END""").as("source"),
        // exact binary fractions: sums are order-independent, so the
        // two shapes' different addition orders cannot diverge
        expr("CAST(pmod(hash(id * 7), 5) AS DOUBLE) / 4.0").as("q"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/scored.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9
    prog("gen", genSec, n)

    def scored: DataFrame = spark.read.parquet(s"$dir/scored.parquet")
    def shipped: DataFrame =
      AuditQueries.driftWindows(scored, expr(s"doc_id div $bucketW"))
    // the naive per-document twin: running (count, sum) over RAW rows
    // — 2.5M mega rows sort in one task — then the bucket-final
    // cumulative pair joins the per-bucket means
    def naive: DataFrame = {
      val w = Window.partitionBy("source").orderBy("doc_id")
      scored
        .withColumn("bucket", expr(s"doc_id div $bucketW"))
        .withColumn("_cn", count(lit(1)).over(w))
        .withColumn("_cs", sum("q").over(w))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("q").as("_sq"),
          max_by(struct(col("_cs"), col("_cn")), col("doc_id")).as("_last"))
        .select(col("source"), col("bucket"), col("n_docs"),
          round(col("_sq") / col("n_docs"), 4).as("mean_q"),
          round(abs(col("_sq") / col("n_docs") -
            col("_last._cs") / col("_last._cn")), 4).as("drift"))
    }

    // invariants FIRST, outside the timings: exact row identity both
    // directions, and the mega source really carries ~n/4 docs
    val megaRows = scored.filter(col("source") === "mega").count()
    require(megaRows >= n / 5,
      s"mega source lost its skew: $megaRows rows of $n")
    val diff = shipped.except(naive).count() + naive.except(shipped).count()
    require(diff == 0, s"shapes disagree on $diff rows")
    val pairRows = shipped.count()
    require(pairRows > 0, "no (source, bucket) rows produced")

    // the ARRIVAL-ORDERED layout: real ingest lands range-ordered by
    // arrival (each file covers a contiguous doc_id span = a few
    // buckets × all sources), where the round-robin layout above is
    // the worst case for the map-side combine (every task sees nearly
    // every (source, bucket) pair, so partial aggregation reduces
    // almost nothing)
    t0 = System.nanoTime()
    scored.repartitionByRange(cpus.toInt, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/scored_ordered.parquet")
    val genOrdSec = (System.nanoTime() - t0) / 1e9
    prog("gen_ordered", genOrdSec, n)
    def scoredOrd: DataFrame =
      spark.read.parquet(s"$dir/scored_ordered.parquet")
    def shippedOrd: DataFrame =
      AuditQueries.driftWindows(scoredOrd, expr(s"doc_id div $bucketW"))
    require(shippedOrd.except(shipped).count() == 0,
      "layout changed the result")

    // interleaved reps over all three legs, every rep recorded
    val aggReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ordReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val winReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 2).foreach { _ =>
      val (aSec, aRows) = cold(timedCount(shipped))
      require(aRows == pairRows, s"shipped rows moved: $aRows")
      aggReps += aSec
      val (oSec, oRows) = cold(timedCount(shippedOrd))
      require(oRows == pairRows, s"ordered rows moved: $oRows")
      ordReps += oSec
      val (wSec, wRows) = cold(timedCount(naive))
      require(wRows == pairRows, s"naive rows moved: $wRows")
      winReps += wSec
      prog("rep", aSec + oSec + wSec, aRows)
    }

    println(
      s"""{"metric":"drift_scale_probe","n_docs":$n,"bucket_w":$bucketW,""" +
        s""""gen_sec":${f"$genSec%.1f"},"mega_rows":$megaRows,""" +
        s""""pair_rows":$pairRows,""" +
        s""""agg_first_sec":${f"${aggReps.min}%.1f"},""" +
        s""""agg_first_reps":${aggReps.map(r => f"$r%.1f").mkString("[", ",", "]")},""" +
        s""""agg_first_ordered_sec":${f"${ordReps.min}%.1f"},""" +
        s""""agg_first_ordered_reps":${ordReps.map(r => f"$r%.1f").mkString("[", ",", "]")},""" +
        s""""naive_window_sec":${f"${winReps.min}%.1f"},""" +
        s""""naive_window_reps":${winReps.map(r => f"$r%.1f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
