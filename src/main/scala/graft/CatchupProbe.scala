package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming catch-up probe: the thousand-batch story, measured.
  *
  * The per-micro-batch pin discipline in
  * [[graft.streaming.Streams.runDecontaminationGate]] (pin the keyed
  * batch, release its blocks after the write; suite prep pinned ONCE
  * before the stream) is spec'd over 3 micro-batches in StreamsSpec.
  * A real deployment catching up after downtime replays HUNDREDS of
  * batches in one AvailableNow run — if any per-batch resource
  * escaped its batch (a pinned block, a checkpoint file, growing
  * lineage), the catch-up would slow down or die partway, not at
  * batch 3. This probe runs a 100-batch catch-up under a HARDENED
  * session (reliablePins=true + checkpoint dir — the regime where a
  * leak would also strand files) and asserts, in-run:
  *
  *   - bounded resident pins: post-run persistent RDDs ≤ the
  *     suite-prep pin + a constant, NOT O(batches);
  *   - bounded checkpoint FS: ≤ 1 rdd-* dir (the suite prep),
  *     regardless of batch count;
  *   - flat per-batch wall time: median of the last 10 batches within
  *     3× the median of batches 11-20 (skipping warmup; medians
  *     because host IO swings spike single batches).
  *
  * Prints one JSON line for BASELINE.md.
  *
  * Usage: runMain graft.CatchupProbe [nBatches] [docsPerBatch]
  */
object CatchupProbe {

  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 100
    val docsPerBatch = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // hardened session: the regime where an escaped per-batch pin
    // would strand one checkpoint file set per batch
    val pinsDir = java.nio.file.Files.createTempDirectory("catchup_pins")
    spark.sparkContext.setCheckpointDir(pinsDir.toString)
    spark.conf.set(graft.operators.Pins.ReliableConf, "true")

    // the backlog: nBatches parquet files; maxFilesPerTrigger=1 turns
    // the AvailableNow run into an nBatches-batch catch-up. ~10% of
    // docs carry a leaked benchmark chunk so every batch exercises the
    // full verdict join, not the empty-pairs fast path.
    val benchText = (1 to 8).map(j => s"bm$j").mkString(" ")
    val bench = Seq((900000L, benchText)).toDF("doc_id", "text")
    val in = java.nio.file.Files.createTempDirectory("catchup_in").toString
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      spark.range(b.toLong * docsPerBatch, (b + 1).toLong * docsPerBatch)
        .select(col("id").as("doc_id"),
          concat(
            array_join(expr(
              """transform(sequence(1, 12),
                 i -> concat('t', pmod(hash(id * 31 + i), 50000)))"""), " "),
            expr(s"CASE WHEN id % 10 = 0 THEN ' $benchText' ELSE '' END"))
            .as("text"))
        .coalesce(1).write.mode("append").parquet(in)
    }
    val genSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] backlog of $nBatches files: $genSec%.1f s")

    // per-batch wall times from the engine's own progress events
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          durations.add(e.progress.batchDuration)
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val out = java.nio.file.Files.createTempDirectory("catchup_out")
      .toString + "/o"
    val ckpt = java.nio.file.Files.createTempDirectory("catchup_ck").toString
    val pinsBefore = spark.sparkContext.getPersistentRDDs.size
    val tRun = System.nanoTime()
    graft.streaming.Streams.runDecontaminationGate(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(in),
      bench, out, ckpt)
    val runSec = (System.nanoTime() - tRun) / 1e9
    // progress events are delivered ASYNC on the listener bus —
    // awaitTermination returning does not mean the last batches'
    // events have landed; poll (bounded) before reading the list
    val flushDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (durations.size < nBatches && System.nanoTime() < flushDeadline)
      Thread.sleep(100)
    spark.streams.removeListener(listener)

    // ---- invariants ----
    val batchMs = {
      val it = durations.iterator()
      val b = Seq.newBuilder[Long]
      while (it.hasNext) b += it.next()
      b.result()
    }
    require(batchMs.size >= nBatches,
      s"expected >= $nBatches data batches, saw ${batchMs.size}")
    def median(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
    // skip warmup (JIT, codegen caches): compare steady-state head vs
    // tail — accumulation shows up as tail >> head. Only meaningful
    // with enough batches for distinct head/tail windows; a short
    // smoke run (< 30 batches) still checks every other invariant.
    val head =
      if (batchMs.size >= 20) median(batchMs.slice(10, 20))
      else median(batchMs)
    val tail = median(batchMs.takeRight(10))
    if (nBatches >= 30)
      require(tail <= head * 3,
        s"per-batch wall time grew: batches 11-20 median $head ms, " +
          s"last-10 median $tail ms")
    // resident pins: suite prep + a constant, never O(batches). The
    // released per-batch pins may linger until the ContextCleaner's
    // async sweep, so allow a small constant, not zero.
    val pinsAfter = spark.sparkContext.getPersistentRDDs.size
    require(pinsAfter - pinsBefore <= 4,
      s"resident pins grew with the backlog: $pinsBefore -> $pinsAfter")
    // checkpoint FS: at most the one suite-prep rdd dir
    val walk = java.nio.file.Files.walk(pinsDir)
    val rddDirs =
      try walk.filter(_.getFileName.toString.startsWith("rdd-"))
        .toArray.length
      finally walk.close()
    require(rddDirs <= 1,
      s"per-batch pins stranded $rddDirs rdd dirs on the checkpoint FS")
    val rows = spark.read.parquet(out).count()
    val contaminated = spark.read.parquet(out)
      .filter(col("contaminated")).count()
    require(rows == nBatches.toLong * docsPerBatch, s"lost rows: $rows")
    // planted leaks are ids ≡ 0 (mod 10) in [0, rows): ceil(rows/10)
    require(contaminated == (rows + 9) / 10,
      s"verdicts drifted: $contaminated contaminated of $rows")

    println(
      s"""{"metric":"catchup_probe","batches":$nBatches,""" +
        s""""docs_per_batch":$docsPerBatch,""" +
        s""""run_sec":${f"$runSec%.1f"},""" +
        s""""batch_ms_head_median":$head,"batch_ms_tail_median":$tail,""" +
        s""""resident_pins_after":${pinsAfter - pinsBefore},""" +
        s""""ckpt_rdd_dirs":$rddDirs,""" +
        s""""rows":$rows,"contaminated":$contaminated}""")
    spark.stop()
  }
}
