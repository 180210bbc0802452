package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Drift-monitor catch-up probe: the backlog story for
  * [[graft.streaming.Streams.streamingDriftMonitor]], measured.
  *
  * StreamsSpec proves the monitor equal to its batch twin over six
  * hand-built micro-batches; a real deployment catching up after
  * downtime replays HUNDREDS of batches in one AvailableNow run. If
  * per-source state grew with the backlog (leaked window partials, a
  * frontier that never advances) the catch-up would slow down or die
  * partway — not at batch 6. This probe generates an nBatches-file
  * backlog over a REALISTICALLY SKEWED source dimension (one
  * mega-source at ~25% of rows, 100 mid sources, a 1k tail — the
  * DriftScaleProbe corpus, one event-time window per file plus ~14%
  * in-lateness stragglers into the previous window) and drains it
  * through BOTH replay regimes the state-bound contract names:
  *
  *   - STEADY (maxFilesPerTrigger=1, ~one window per micro-batch —
  *     the contract's steady-state regime): asserts, in-run, that
  *     per-batch state ROWS are exactly flat at one row per seen
  *     source (never O(backlog)), that state BYTES and per-batch wall
  *     time stay flat between the early and late batches of the run
  *     (medians, CatchupProbe's convention), and that the drained
  *     output EQUALS the batch twin ([[graft.AuditQueries
  *     .driftWindows]]) restricted to the windows the final watermark
  *     closed — exact set equality, q values are quarter-integers so
  *     both engines' sums are order-exact.
  *   - TRANSIENT (the whole backlog in ONE micro-batch — the
  *     documented exception where a batch spanning B windows holds up
  *     to B open partials per source until the next batch's watermark
  *     sweeps them): asserts the SAME output equality (the no-data
  *     batch after the watermark jump must close everything but the
  *     last window) and records the peak state bytes next to the
  *     steady leg's, making the transient visible as a number instead
  *     of a doc footnote.
  *
  * Prints one JSON line for BASELINE.md.
  *
  * Usage: runMain graft.DriftCatchupProbe [nBatches] [docsPerBatch]
  */
object DriftCatchupProbe {

  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 100
    val docsPerBatch = if (args.length > 1) args(1).toInt else 20000
    val winMin = 10
    val latenessMin = 5
    val winUs = winMin * 60L * 1000000L
    val base = 1767225600000000L // 2026-01-01 00:00 UTC — window-aligned
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark

    // ---- the backlog: nBatches parquet files, file b = event-time
    // window b (ms-aligned timestamps so the engine's ms-precision
    // watermark math is exact), with id % 7 == 0 rows straggling into
    // the PREVIOUS window — inside the lateness budget, so both
    // engines keep them and the equality check covers the late path
    val in = java.nio.file.Files.createTempDirectory("driftcu_in").toString
    var t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val winStart = base + b * winUs
      val prevStart = base + math.max(b - 1, 0) * winUs
      spark.range(b.toLong * docsPerBatch, (b + 1).toLong * docsPerBatch)
        .select(
          expr("""CASE WHEN id % 4 = 0 THEN 'mega'
                  WHEN id % 4 = 1 THEN concat('mid', pmod(hash(id), 100))
                  ELSE concat('tail', pmod(hash(id * 31), 1000))
                  END""").as("source"),
          expr(s"""CASE WHEN id % 7 = 0 THEN $prevStart ELSE $winStart END
                   + pmod(hash(id * 13), ${winMin * 60L * 1000L}) * 1000""")
            .as("ts_us"),
          // quarter-integers: sums are order-independent, so stream
          // fold order vs batch partial-agg order cannot diverge
          expr("CAST(pmod(hash(id * 7), 5) AS DOUBLE) / 4.0").as("q"))
        .coalesce(1).write.mode("append").parquet(in)
    }
    val genSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] backlog of $nBatches files: $genSec%.1f s")

    // ---- expected rows: the batch twin over the FULL input,
    // restricted to the windows the final watermark closes (the last
    // window stays open at drain end — AvailableNow stops at the data
    // horizon, it cannot see "time passing" beyond it)
    val all: DataFrame = spark.read.parquet(in)
    val nSources = all.select("source").distinct().count()
    val maxTsUs = all.agg(max("ts_us")).head().getLong(0)
    val finalWmUs = (maxTsUs / 1000L - latenessMin * 60L * 1000L) * 1000L
    def rowSet(df: DataFrame): Set[(String, Long, Long, Double, Double)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val expected = rowSet(
      AuditQueries.driftWindows(all, expr(s"ts_us div $winUs"))
        .filter((col("bucket") + 1) * winUs <= finalWmUs))
    require(expected.nonEmpty, "no closable windows in the backlog")
    require(expected.map(_._2).size >= nBatches - 2,
      s"expected a closed window per batch file: ${expected.map(_._2).size}")

    // per-batch wall/state metrics from the engine's own progress
    // events (delivered async — drained with a bounded poll below)
    final case class B(rows: Long, ms: Long, stateRows: Long,
      stateBytes: Long)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[B]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit = {
        val st = e.progress.stateOperators.headOption
        batches.add(B(e.progress.numInputRows, e.progress.batchDuration,
          st.map(_.numRowsTotal).getOrElse(0L),
          st.map(_.memoryUsedBytes).getOrElse(0L)))
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    def drainLeg(tag: String, perFile: Boolean): (Double, Vector[B]) = {
      batches.clear()
      val out = java.nio.file.Files
        .createTempDirectory(s"driftcu_$tag").toString + "/o"
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"driftcu_ck_$tag").toString
      val reader = spark.readStream
        .schema("source STRING, ts_us LONG, q DOUBLE")
      val src = (if (perFile) reader.option("maxFilesPerTrigger", 1)
                 else reader).parquet(in)
      val t = System.nanoTime()
      val q = graft.streaming.Streams
        .streamingDriftMonitor(src, winMin, latenessMin)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t) / 1e9
      // progress events land async on the listener bus; poll (bounded)
      // until the data batches we know ran have all reported
      val want = if (perFile) nBatches else 1
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def dataBatches = {
        val it = batches.iterator(); var n = 0
        while (it.hasNext) { if (it.next().rows > 0) n += 1 }; n
      }
      while (dataBatches < want && System.nanoTime() < deadline)
        Thread.sleep(100)
      val got = rowSet(spark.read.parquet(out)
        .select("source", "bucket", "n_docs", "mean_q", "drift"))
      require(got == expected,
        s"$tag: drained output diverged from the batch twin: " +
          s"${(got -- expected).take(3)} extra, " +
          s"${(expected -- got).take(3)} missing " +
          s"(got ${got.size}, expected ${expected.size})")
      val it = batches.iterator()
      val b = Vector.newBuilder[B]
      while (it.hasNext) b += it.next()
      System.err.println(f"[probe] $tag%-9s drained $sec%7.1f s, " +
        s"output rows = ${got.size}")
      (sec, b.result())
    }

    // ---- STEADY leg: one file per micro-batch
    val (steadySec, steadyAll) = drainLeg("steady", perFile = true)
    val steady = steadyAll.filter(_.rows > 0)
    require(steady.size >= nBatches,
      s"expected >= $nBatches data batches, saw ${steady.size}")
    def median(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
    // state rows: one per SEEN source, exactly — never O(backlog).
    // Rows may grow while tail sources are still being discovered (a
    // 10-doc/batch tail source can miss early draws), so the invariant
    // is: never above nSources, and FROZEN from the first batch that
    // reaches it — a backlog-proportional leak would keep climbing.
    val rowsSeq = steady.map(_.stateRows)
    require(rowsSeq.forall(_ <= nSources),
      s"state rows exceeded one per source ($nSources): " +
        s"${rowsSeq.filter(_ > nSources).take(5)}")
    val full = rowsSeq.indexOf(nSources)
    require(full >= 0 && rowsSeq.drop(full).forall(_ == nSources),
      s"state rows not flat at $nSources once all sources seen: " +
        s"first-full=$full ${rowsSeq.drop(math.max(full, 0)).distinct.take(5)}")
    // state bytes + wall time: flat between early and late batches
    // (medians — host IO swings spike single batches)
    val (bytesHead, bytesTail) =
      (median(steady.slice(10, 20).map(_.stateBytes)),
        median(steady.takeRight(10).map(_.stateBytes)))
    val (msHead, msTail) = (median(steady.slice(10, 20).map(_.ms)),
      median(steady.takeRight(10).map(_.ms)))
    if (nBatches >= 30) {
      require(bytesTail <= bytesHead * 2,
        s"state bytes grew with the backlog: $bytesHead -> $bytesTail")
      require(msTail <= msHead * 3,
        s"per-batch wall grew with the backlog: $msHead -> $msTail ms")
    }

    // ---- TRANSIENT leg: the whole backlog in one micro-batch — the
    // contract's documented bound exception, measured: the single data
    // batch's state holds EVERY window of the run as an open partial
    // (nothing closes against its start-of-batch watermark of 0);
    // the no-data batch then sweeps all but the last window closed
    val (bigSec, bigAll) = drainLeg("transient", perFile = false)
    val bigPeakBytes = bigAll.map(_.stateBytes).max
    val steadyPeakBytes = steadyAll.map(_.stateBytes).max
    require(bigPeakBytes > steadyPeakBytes,
      "the one-batch replay should transiently hold more window " +
        s"partials than steady state: $bigPeakBytes <= $steadyPeakBytes")

    println(
      s"""{"metric":"drift_catchup_probe","batches":$nBatches,""" +
        s""""docs_per_batch":$docsPerBatch,"n_sources":$nSources,""" +
        s""""closed_rows":${expected.size},""" +
        s""""steady_sec":${f"$steadySec%.1f"},""" +
        s""""batch_ms_head_median":$msHead,"batch_ms_tail_median":$msTail,""" +
        s""""state_rows":$nSources,""" +
        s""""state_bytes_head_median":$bytesHead,""" +
        s""""state_bytes_tail_median":$bytesTail,""" +
        s""""transient_sec":${f"$bigSec%.1f"},""" +
        s""""state_bytes_peak_steady":$steadyPeakBytes,""" +
        s""""state_bytes_peak_transient":$bigPeakBytes}""")
    spark.stop()
  }
}
