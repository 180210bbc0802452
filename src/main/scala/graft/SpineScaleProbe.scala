package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fingerprint-spine probe: the r13 verdict-spine trade (fp window →
  * per-fp min + merge join-back), measured in its two regimes.
  *
  * The fused verdicts compute `fp_keep` (keep-one over the exact
  * fingerprint). The window form — `min().over(Window.partitionBy
  * ("fp"))` — pays ONE exchange and looks cheaper at bench SF, but a
  * VIRAL byte-identical cluster (the template mega-cluster regime the
  * star pair generator targets; exact copies are the most common dup
  * class in real crawls) is one fp group funneled through a single
  * task with no map-side combine and no AQE skew split. The join form
  * partial-aggregates the per-fp min map-side and joins it back
  * merge-hinted — one more exchange of narrow rows, every stage
  * parallel and skew-splittable.
  *
  * This probe plants a corpus where `megaShare` of N docs are ONE
  * byte-identical cluster and times BOTH shapes, interleaved (A,B,A,B;
  * min per shape — host IO swings between cold runs), asserting
  * identical keep counts. The sf0.1 tax the trade pays is measured
  * separately (interleaved QTime on q124/q124b/q134: +0.25-0.45 s per
  * verdict — BASELINE.md); this probe measures what it buys.
  *
  * Usage: runMain graft.SpineScaleProbe [nDocs] [megaShare%]
  */
object SpineScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val megaPct = if (args.length > 1) args(1).toInt else 50
    val mega = n * megaPct / 100
    // validate BEFORE paying the multi-minute run: the probe exists to
    // measure the viral-cluster regime, so demand a real cluster
    require(n >= 2 && megaPct >= 1 && megaPct <= 100 && mega >= 2,
      s"need a non-degenerate mega cluster: n=$n megaPct=$megaPct " +
        s"gives mega=$mega (want 2 <= mega <= n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ids < mega share ONE exact text (a single fp group); the tail is
    // per-doc unique. ~25 tokens/doc like the verdict probes.
    val dir = java.nio.file.Files.createTempDirectory("spine_probe").toString
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr(s"CASE WHEN id < $mega THEN CAST(-1 AS BIGINT) ELSE id END")
          .as("base"))
      .select(col("doc_id"),
        expr("""array_join(transform(sequence(1, 25),
               i -> concat('w', pmod(hash(base * 1009 + i), 5000))), ' ')""")
          .as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def docq(): DataFrame = graft.operators.Pins.pin(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          md5(coalesce(lower(trim(col("text"))), lit(""))).as("fp")))

    // the two spine shapes over an identically-built pinned input
    def windowSpine(d: DataFrame): DataFrame = d
      .withColumn("fp_keep", col("doc_id") === min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .select("doc_id", "fp_keep")
    def joinSpine(d: DataFrame): DataFrame = {
      val fpMin = d.groupBy("fp").agg(min("doc_id").as("_fp_min"))
      d.join(fpMin.hint("merge"), "fp")
        .select(col("doc_id"),
          (col("doc_id") === col("_fp_min")).as("fp_keep"))
    }

    def cold(shape: DataFrame => DataFrame): (Double, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      val keeps = shape(docq()).filter(col("fp_keep")).count()
      ((System.nanoTime() - t0) / 1e9, keeps)
    }
    var winMin = Double.MaxValue
    var joinMin = Double.MaxValue
    var winKeeps = 0L
    var joinKeeps = 0L
    (1 to 2).foreach { rep =>
      val (w, wk) = cold(windowSpine); winMin = math.min(winMin, w); winKeeps = wk
      val (j, jk) = cold(joinSpine); joinMin = math.min(joinMin, j); joinKeeps = jk
      System.err.println(f"[probe] rep$rep window=$w%.1f s join=$j%.1f s")
    }
    // identical semantics: one keeper for the mega fp + every unique doc
    val expect = 1L + (n - mega)
    require(winKeeps == expect && joinKeeps == expect,
      s"spine shapes disagree: window=$winKeeps join=$joinKeeps expect=$expect")

    println(
      s"""{"metric":"spine_scale_probe","n_docs":$n,"mega":$mega,""" +
        s""""window_sec":${f"$winMin%.1f"},"join_sec":${f"$joinMin%.1f"},""" +
        s""""keeps":$joinKeeps}""")
    spark.stop()
  }
}
