package graft

import org.apache.spark.sql.SparkSession

/** SQL-front-door-at-scale probe: r11 marked the curation TVFs "weak
  * at serving scale" because their pipelines materialized at SQL
  * ANALYSIS time; r12 deferred the build to execution
  * ([[graft.plans.LazyTvfPlan]]). This probe closes the thread at
  * corpus scale: over an N-doc planted corpus
  * ([[DedupScaleProbe.writePlantedCorpus]]) it wall-clocks
  *
  *   - `EXPLAIN SELECT * FROM curation_verdict(dir)` — must be
  *     sub-second-class and leave ZERO pinned blocks (the r11 shape
  *     ran the full verdict here);
  *   - the executed TVF vs the library `q124DedupVerdict`, INTERLEAVED
  *     double reps with min per path (the SampleScaleProbe noise
  *     discipline) — the deferred leaf is a pass-through over the
  *     identical inner pipeline, so the two must track within session
  *     noise;
  *
  * and asserts in-run that the TVF's (rows, keep-count) equal the
  * library's. Prints one JSON line for BASELINE.md.
  * Usage: runMain graft.TvfScaleProbe [nDocs]
  * (needs SPARK_DRIVER_MEM=64g like the other verdict probes — the
  * exact verdict's hash aggregates overflow the 8g default heap
  * already at the 1M default). */
object TvfScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("tvf_probe").toString
    val genSec = DedupScaleProbe.writePlantedCorpus(spark, n, cpus.toInt, dir)
    System.err.println(f"[probe] gen      $genSec%8.1f s")

    def cool(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    // EXPLAIN first — before any cache warms anything: planning only,
    // zero pins (the r11 eager shape would run the full verdict here)
    val pinsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val tEx = System.nanoTime()
    spark.sql(s"EXPLAIN EXTENDED SELECT * FROM curation_verdict('$dir')")
      .collect()
    val exSec = (System.nanoTime() - tEx) / 1e9
    val newPins = spark.sparkContext.getPersistentRDDs.keySet -- pinsBefore
    assert(newPins.isEmpty, s"EXPLAIN pinned blocks: $newPins")
    System.err.println(f"[probe] explain  $exSec%8.1f s  (0 pins)")

    // ONE action per rep: every ACTION on a TVF frame replans and so
    // rebuilds the deferred pipeline (the documented cost model — run
    // once, cache/write the result), so a fair lib-vs-tvf rep reads
    // rows and keep-count in a single aggregate job
    import org.apache.spark.sql.functions._
    def measure(v: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = v.agg(count(lit(1)),
        sum(when(col("keep"), 1L).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def runLib(): (Double, Long, Long) = {
      cool()
      val t0 = System.nanoTime()
      val (rows, keep) = measure(DedupQueries.q124DedupVerdict(spark, dir))
      ((System.nanoTime() - t0) / 1e9, rows, keep)
    }
    def runTvf(): (Double, Long, Long) = {
      cool()
      val t0 = System.nanoTime()
      val (rows, keep) =
        measure(spark.sql(s"SELECT * FROM curation_verdict('$dir')"))
      ((System.nanoTime() - t0) / 1e9, rows, keep)
    }

    // interleaved double reps, min per path (SampleScaleProbe noise
    // discipline: a single A-then-B ordering attributes host IO swings
    // to whichever ran second)
    val reps = Seq(("lib", () => runLib()), ("tvf", () => runTvf()),
      ("lib", () => runLib()), ("tvf", () => runTvf())).map {
      case (name, f) =>
        val (sec, rows, keep) = f()
        System.err.println(f"[probe] $name%-8s $sec%8.1f s  rows=$rows keep=$keep")
        (name, sec, rows, keep)
    }
    val libSec = reps.collect { case ("lib", s, _, _) => s }.min
    val tvfSec = reps.collect { case ("tvf", s, _, _) => s }.min
    val counts = reps.map(r => (r._3, r._4)).distinct
    assert(counts.size == 1,
      s"TVF and library verdicts disagree across reps: $counts")

    println(s"""{"probe":"tvf_scale","n":$n,""" +
      s""""gen_s":${f"$genSec%.1f"},"explain_s":${f"$exSec%.2f"},""" +
      s""""lib_s":${f"$libSec%.1f"},"tvf_s":${f"$tvfSec%.1f"},""" +
      s""""tvf_over_lib":${f"${tvfSec / libSec}%.2f"},""" +
      s""""rows":${counts.head._1},"keep":${counts.head._2}}""")
    spark.stop()
  }
}
