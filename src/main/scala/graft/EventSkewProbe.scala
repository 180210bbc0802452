package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event/user-window mega-key probe: the r13 verdict's audit item —
  * a BOT USER (one user_id carrying a crawl-scale share of the events
  * table) is the events analogue of the viral fingerprint cluster,
  * and every `Window.partitionBy(user_id)` funnels that user's whole
  * history through ONE task with no map-side combine and no AQE skew
  * split.
  *
  * Two corpora, identical size: FLAT (events spread uniformly over
  * ~n/100 users) and HOT (the same rows with `hotShare` of them
  * reassigned to user 0 — the bot). Over both, the probe times:
  *
  *   - q09's two shapes, A/B: the REWRITTEN max_by aggregate (shipped)
  *     vs the old `row_number().over(partitionBy(user_id))` window,
  *     asserting identical keeper rows — this is what the r14 rewrite
  *     buys and what it costs;
  *   - q64's two shapes, A/B: the shipped CUMULATIVE-DIFFERENCE
  *     rolling window vs the naive `rangeBetween(-24h, 0)` sliding
  *     frame. Spark's sliding WindowFunctionFrame cannot retract, so
  *     it re-aggregates the whole frame per row — O(n·f) for a bot
  *     with f in-frame events. The r14 runs of this probe used a
  *     corpus whose 32-bit-hashed ts collapsed into two ~36-min
  *     bands (frames ~15× denser than intended — BASELINE.md r15
  *     correction): there a 10%-bot sliding task passed 34
  *     CPU-MINUTES before being killed and the 2%-bot read 280-305 s;
  *     on the fixed uniform corpus the 2%-bot sliding leg reads
  *     ~39 s vs ~5 s cumulative. Same curve, density is the
  *     multiplier — which is why the default bot share is sized so
  *     the sliding twin terminates, and why the cumulative form
  *     ships;
  *   - the two remaining per-user ORDERED-TRAVERSAL windows: q40
  *     (as-of last-click) and q29 (sessionize). Both ride MONOTONE
  *     frames (running last / lag / running sum — incremental, O(n)
  *     per partition), so the bot costs one linear task; the
  *     hot-vs-flat delta measured here is that task — the BASELINE.md
  *     disposition row that says how far the shipped shapes carry
  *     before a pipeline must pre-filter or TTL-bound bot users;
  *   - boundedUserHistory A/B (r15 — the CALLABLE form of that
  *     disposition): the shipped bounded-heap keep-last-N aggregate
  *     vs its window row_number twin, survivor sets asserted
  *     identical.
  *
  * Invariants asserted in-run (before any timing is trusted): q09 and
  * q64 shapes row-identical on both corpora; q40/q29 outputs preserve
  * row/user counts and per-query sanity.
  *
  * Usage: runMain graft.EventSkewProbe [nEvents] [hotShare%]
  */
object EventSkewProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    // 2% of 10M = a 200k-event bot (~6.6k events per 24h frame on the
    // uniform corpus): big enough that the sliding twin's Σ|frame| ≈
    // 6.6×10⁸ re-added rows dominates its runtime (~39 s measured),
    // small enough that it terminates (the r14 banded corpus at 10%
    // left the sliding bot task past 34 CPU-minutes)
    val hotPct = if (args.length > 1) args(1).toInt else 2
    val hot = n * hotPct / 100
    require(n >= 1000 && hotPct >= 1 && hotPct <= 100 && hot >= 2,
      s"need a non-degenerate bot user: n=$n hotPct=$hotPct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val users = math.max(n / 100, 2L)

    // ONE events writer for every corpus in this probe, parameterized
    // by the user-assignment expression. ts MUST hash with xxhash64:
    // 32-bit hash() under the 30-day modulus (2.592e12 ≫ 2^31) covers
    // only two ~36-minute bands at the range's edges — the original
    // r14 corpus had that bug, which made every 24h frame hold ~half
    // the bot's events instead of the uniform ~1/30 the comments
    // claimed (the sliding cliff it measured was real but ~15× denser
    // than documented; r15 re-measured on the fixed corpus).
    def writeEvents(dir: String, count: Long, user: org.apache.spark.sql.Column): Unit =
      spark.range(count)
        .select(col("id").as("event_id"),
          user.as("user_id"),
          // 30 days of microsecond timestamps, id-hashed (not id-linear,
          // so the bot's events interleave with everyone else's)
          timestamp_micros(lit(1700000000000000L) +
            pmod(xxhash64(col("id"), lit(7)), lit(2592000000000L))).as("ts"),
          element_at(array(lit("click"), lit("view"), lit("error")),
            (pmod(hash(col("id"), lit(11)), lit(3)) + 1).cast("int")).as("event_type"),
          (pmod(hash(col("id"), lit(13)), lit(10000)) / 100.0).as("value"),
          lit("{}").as("props"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

    def writeCorpus(dir: String, makeHot: Boolean): Unit = {
      // bot rows are the FIRST `hot` ids so the hot corpus is the flat
      // corpus with a contiguous id range reassigned — same rows, same
      // timestamps, only the user skew differs
      val user =
        if (makeHot) expr(s"CASE WHEN id < $hot THEN 0L ELSE pmod(hash(id), $users) + 1 END")
        else expr(s"pmod(hash(id), $users) + 1")
      writeEvents(dir, n, user)
    }

    // the PRE-REWRITE q09 shape, kept here as the A/B twin (the
    // registry form is the max_by aggregate; PlanRegressionSpec's
    // allowlist would not catch this probe-local window — user_id is
    // an allowlisted key — but the probe exists to measure it)
    def q09Window(s: SparkSession, dir: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 2).as("value"))
    }

    // the keep-last-N twin pair, shared by the per-tag A/B and the
    // extreme-skew block below
    def bhWindow(d: String, k: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.load(spark, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
    }
    def bhHeap(d: String, k: Int): DataFrame =
      graft.operators.RankOps.boundedUserHistory(
        Tables.load(spark, d, "events")
          .select(col("user_id"), col("event_id"), col("ts")),
        "user_id", "ts", "event_id", k)

    def time(body: => Long): (Double, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq(("flat", false), ("hot", true)).foreach { case (tag, makeHot) =>
      val dir = java.nio.file.Files.createTempDirectory(s"evskew_$tag").toString
      writeCorpus(dir, makeHot)
      // distinct users actually present (hash spread, plus the bot on
      // the hot corpus)
      val nUsers =
        Tables.load(spark, dir, "events").select("user_id").distinct().count()

      // q09 A/B — interleaved reps, identical-rows assertion once
      var aggMin = Double.MaxValue; var winMin = Double.MaxValue
      (1 to 2).foreach { _ =>
        val (ta, ca) = time(Queries.q09WindowDedup(spark, dir).count())
        val (tw, cw) = time(q09Window(spark, dir).count())
        require(ca == nUsers && cw == nUsers,
          s"q09 keeper count $ca/$cw != users $nUsers ($tag)")
        aggMin = math.min(aggMin, ta); winMin = math.min(winMin, tw)
      }
      val diff = Queries.q09WindowDedup(spark, dir).as("a")
        .join(q09Window(spark, dir).as("b"), Seq("user_id"))
        .filter(col("a.event_id") =!= col("b.event_id") ||
          col("a.value") =!= col("b.value"))
        .count()
      require(diff == 0, s"q09 shapes disagree on $diff users ($tag)")
      results(s"q09_agg_$tag") = aggMin
      results(s"q09_window_$tag") = winMin

      // q64 A/B: shipped cumulative-difference vs the naive sliding
      // RANGE frame (the O(n·f) twin) — interleaved, fingerprints equal
      def q64Sliding(d: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-86400000000L, 0L)
        Tables.load(spark, d, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("roll_cnt", count(lit(1)).over(w))
          .withColumn("roll_sum", round(sum("value").over(w), 4))
          .select("event_id", "user_id", "roll_cnt", "roll_sum")
      }
      def fp64(df: DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)), sum("roll_cnt"),
          sum(round(col("roll_sum") * 10000).cast("long"))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      var cumMin = Double.MaxValue; var slideMin = Double.MaxValue
      var fpC = (0L, 0L, 0L); var fpS = (0L, 0L, 0L)
      (1 to 2).foreach { _ =>
        val (tc, fc) = time {
          fpC = fp64(AnalyticsQueries.q64RollingWindow(spark, dir)); fpC._1
        }
        val (ts, fs) = time { fpS = fp64(q64Sliding(dir)); fpS._1 }
        require(fc == n && fs == n, s"q64 lost rows ($tag): $fc/$fs")
        cumMin = math.min(cumMin, tc); slideMin = math.min(slideMin, ts)
      }
      require(fpC == fpS, s"q64 shapes disagree ($tag): $fpC vs $fpS")
      results(s"q64_cumulative_$tag") = cumMin
      results(s"q64_sliding_$tag") = slideMin

      // the remaining ordered-traversal windows — per-query invariants
      // read off ONE timed pass each
      val (t40, s40) = time {
        val r = Queries.q40AsofWindow(spark, dir)
          .agg(count(lit(1)), count("last_click_us")).head()
        r.getLong(0) * 1000000000L + r.getLong(1)
      }
      require(s40 / 1000000000L == n && s40 % 1000000000L > 0,
        s"q40 lost rows or resolved zero clicks ($tag): $s40")
      results(s"q40_asof_$tag") = t40
      val (t29, s29) = time {
        val r = PipelineQueries.q29Sessionize(spark, dir)
          .agg(count(lit(1)),
            sum(when(col("n_sessions") < 1, 1L).otherwise(0L))).head()
        r.getLong(0) * 1000000000L + r.getLong(1)
      }
      require(s29 == nUsers * 1000000000L,
        s"q29 lost users or produced empty sessions ($tag): $s29")
      results(s"q29_sessionize_$tag") = t29

      // q48 shipped form (cumulative pair count) on both corpora — the
      // join twin is measured separately below at a size where its
      // quadratic key group still terminates
      val (t48, s48) = time {
        val r = Queries.q48RangeJoin(spark, dir)
          .agg(count(lit(1)), sum("n_close_pairs")).head()
        r.getLong(0) * 1000000000L + r.getLong(1)
      }
      require(s48 % 1000000000L > 0, s"q48 found zero close pairs ($tag)")
      results(s"q48_cumulative_$tag") = t48

      // boundedUserHistory A/B (the callable q40/q29 bot disposition,
      // r15): the shipped bounded-heap aggregate vs the window
      // keep-last-N twin. The heap prunes a HOT user to k per
      // partition IN THE MAP STAGE (no task receives more than
      // k·partitions rows of one user); on a flat corpus it buys
      // nothing and pays per-row buffer maintenance — both walls
      // recorded, honest constant documented in BASELINE.md.
      // Survivor sets asserted identical.
      val kKeep = 100
      var heapMin = Double.MaxValue; var bwinMin = Double.MaxValue
      (1 to 2).foreach { _ =>
        val (th, ch) = time(bhHeap(dir, kKeep).count())
        val (tw2, cw2) = time(bhWindow(dir, kKeep).count())
        require(ch == cw2 && ch > 0,
          s"boundedUserHistory counts differ ($tag): $ch/$cw2")
        heapMin = math.min(heapMin, th); bwinMin = math.min(bwinMin, tw2)
      }
      val bhDiff = bhHeap(dir, kKeep).as("a")
        .join(bhWindow(dir, kKeep).as("b"),
          Seq("user_id", "event_id"), "full")
        .filter(col("a.ts").isNull || col("b.ts").isNull).count()
      require(bhDiff == 0,
        s"boundedUserHistory survivor sets differ ($tag): $bhDiff rows")
      results(s"bh_heap_$tag") = heapMin
      results(s"bh_window_$tag") = bwinMin

      System.err.println(s"[probe] $tag done: " + results.filter(_._1.endsWith(tag))
        .map { case (k, v) => f"$k=$v%.1f" }.mkString(" "))
    }

    // q48 head-to-head at a config where the JOIN twin's quadratic key
    // group still terminates: n/10 events, same 2%-share bot. The
    // twin's candidate volume inside the bot's SMJ key group is
    // |bot|² ≈ 4×10⁸ here; at the main corpus's 200k bot it is 4×10¹⁰
    // — the reason it is not run above.
    val smallN = math.max(n / 10, 10000L)
    val dir2 = java.nio.file.Files.createTempDirectory("evskew_h2h").toString
    val smallHot = smallN * hotPct / 100
    writeEvents(dir2, smallN,
      expr(s"CASE WHEN id < $smallHot THEN 0L ELSE pmod(hash(id), " +
        s"${math.max(smallN / 100, 2L)}) + 1 END"))
    def q48Join(d: String): DataFrame = {
      val ev = Tables.load(spark, d, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      ev.as("a").join(ev.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_id") < col("b.event_id") &&
            abs(col("b.us") - col("a.us")) <= 60000000L)
        .groupBy(col("a.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_close_pairs"))
    }
    var cum48 = Double.MaxValue; var join48 = Double.MaxValue
    (1 to 2).foreach { _ =>
      val (tc, _) = time(Queries.q48RangeJoin(spark, dir2).count())
      val (tj, _) = time(q48Join(dir2).count())
      cum48 = math.min(cum48, tc); join48 = math.min(join48, tj)
    }

    // boundedUserHistory at EXTREME skew (separate corpus — the main
    // corpora keep the 2% bot so the sliding twin terminates): half
    // the events on ONE user. The window funnels n/2 rows through one
    // task's sort — LINEAR, and still fast at this scale (a local
    // Tungsten sort of 5M narrow rows is sub-second), so no local
    // crossover is expected; the row documents that the heap's value
    // is the bounded-task GUARANTEE, not a single-node win.
    val dir3 = java.nio.file.Files.createTempDirectory("evskew_bh").toString
    writeEvents(dir3, n,
      expr(s"CASE WHEN id % 2 = 0 THEN 0L ELSE pmod(hash(id), $users) + 1 END"))
    var bhHeap50 = Double.MaxValue; var bhWin50 = Double.MaxValue
    (1 to 2).foreach { _ =>
      val (th, ch) = time(bhHeap(dir3, 100).count())
      val (tw, cw) = time(bhWindow(dir3, 100).count())
      require(ch == cw && ch > 0, s"bh extreme counts differ: $ch/$cw")
      bhHeap50 = math.min(bhHeap50, th); bhWin50 = math.min(bhWin50, tw)
    }
    results("bh_heap_50pct") = bhHeap50
    results("bh_window_50pct") = bhWin50
    System.err.println(f"[probe] bh extreme (50%% bot, n=$n): " +
      f"heap=$bhHeap50%.1f s window=$bhWin50%.1f s")
    val q48diff = Queries.q48RangeJoin(spark, dir2).as("a")
      .join(q48Join(dir2).as("b"), Seq("user_id"), "full")
      .filter(!(col("a.n_close_pairs") <=> col("b.n_close_pairs")))
      .count()
    require(q48diff == 0, s"q48 shapes disagree on $q48diff users")
    results(s"q48_cumulative_small") = cum48
    results(s"q48_join_small") = join48
    System.err.println(f"[probe] q48 h2h (n=$smallN, bot=$smallHot): " +
      f"cumulative=$cum48%.1f s join=$join48%.1f s")

    println("""{"metric":"event_skew_probe","n_events":""" + n +
      s""","hot_events":$hot,"h2h_n":$smallN,""" +
      results.map { case (k, v) => s""""$k":${f"$v%.1f"}""" }.mkString(",") +
      "}")
    spark.stop()
  }
}
