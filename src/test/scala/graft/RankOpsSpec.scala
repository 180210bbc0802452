package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RankOps

/** globalRowNumber must agree with the single-partition window form. */
class RankOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("globalRowNumber equals window row_number under the same order") {
    import spark.implicits._
    val df = Seq((5L, 0.5), (1L, 0.9), (3L, 0.9), (2L, 0.1), (4L, 0.5))
      .toDF("id", "score").repartition(4)
    val got = RankOps.globalRowNumber(df,
      Seq(col("score").desc, col("id").asc), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      .select("id", "r").as[(Long, Int)].collect().toMap
      .map { case (k, v) => k -> v.toLong }
    assert(got == want)
    assert(got.values.toSeq.sorted == (1L to 5L))
  }

  test("globalRowNumber equals the window form on random tied data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy ties (scores drawn from 4 values) across several sizes —
    // exactly the shape where a partition-boundary bug would misrank
    Seq(1, 17, 1000, 4096).foreach { n =>
      val df = Seq.fill(n)((rnd.nextLong(), rnd.nextInt(4) * 0.25))
        .toDF("id", "score").repartition(13)
      val got = RankOps.globalRowNumber(df,
        Seq(col("score").desc, col("id").asc), "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
      val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select("id", "r").as[(Long, Int)].collect().toMap
        .map { case (k, v) => k -> v.toLong }
      assert(got == want, s"n=$n")
    }
  }

  test("globalRowNumberPer ranks each leg independently in one shuffle") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(3000)((rnd.nextLong(),
        if (rnd.nextBoolean()) "lex" else "vec", rnd.nextInt(5) * 0.2))
      .toDF("id", "leg", "key").repartition(9)
    val got = RankOps.globalRowNumberPer(df, "leg",
        Seq(col("key").desc, col("id").asc), "r")
      .select("leg", "id", "r").as[(String, Long, Long)].collect()
      .map { case (l, i, r) => (l, i) -> r }.toMap
    val want = df.withColumn("r", row_number().over(
        Window.partitionBy("leg").orderBy(col("key").desc, col("id").asc)))
      .select("leg", "id", "r").as[(String, Long, Int)].collect()
      .map { case (l, i, r) => (l, i) -> r.toLong }.toMap
    assert(got == want)
    // each leg's ranks are a contiguous 1..n_leg sequence
    Seq("lex", "vec").foreach { l =>
      val rs = got.collect { case ((`l`, _), r) => r }.toSeq.sorted
      assert(rs == (1L to rs.length))
    }
  }

  test("runningSumPer equals the per-leg window running sum") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // one mega-leg (90% of rows) — the skew regime the operator exists
    // for — plus small legs and a leg with a single row
    val df = (1 to 5000).map { i =>
      val leg = if (rnd.nextInt(10) < 9) "en"
        else if (i == 17) "solo" else Seq("de", "zh")(rnd.nextInt(2))
      (i.toLong, leg, rnd.nextInt(50).toLong + 1)
    }.toDF("id", "leg", "v").repartition(13)
    val got = RankOps.runningSumPer(df, "leg", Seq(col("id").asc), "v", "c")
      .select("leg", "id", "c").as[(String, Long, Long)].collect()
      .map { case (l, i, c) => (l, i) -> c }.toMap
    val want = df.withColumn("c", sum("v").over(
        Window.partitionBy("leg").orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("leg", "id", "c").as[(String, Long, Long)].collect()
      .map { case (l, i, c) => (l, i) -> c }.toMap
    assert(got == want)
  }

  test("per-leg ops keep NULL legs, matching the window forms") {
    import spark.implicits._
    // Window.partitionBy (and SQL PARTITION BY) treat NULL as one
    // ordinary partition; the join-back must be null-safe or every
    // null-leg row silently vanishes
    val df = Seq((1L, Some("a"), 3L), (2L, None, 5L), (3L, Some("a"), 2L),
        (4L, None, 7L), (5L, Some("b"), 1L))
      .toDF("id", "leg", "v").repartition(3)
    val gotSum = RankOps.runningSumPer(df, "leg", Seq(col("id").asc), "v", "c")
      .select("id", "c").as[(Long, Long)].collect().toMap
    assert(gotSum == Map(1L -> 3L, 2L -> 5L, 3L -> 5L, 4L -> 12L, 5L -> 1L))
    val gotRank = RankOps.globalRowNumberPer(df, "leg",
        Seq(col("id").asc), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(gotRank == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("distributionRanksPer equals the window ntile/percent_rank/cume_dist") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // 90% mega-leg (the regime the operator exists for) + small legs +
    // a single-row leg (percent_rank's 0/0 edge) + NULL legs + legs
    // with fewer rows than tiles; heavy ties in the value key broken
    // by id — the operator's total-order contract
    val df = (1 to 4000).map { i =>
      val leg =
        if (i == 7) Some("solo")
        else if (i % 400 == 3) Some("tiny")
        else if (i % 20 == 0) None
        else if (rnd.nextInt(10) < 9) Some("en")
        else Some(Seq("de", "zh")(rnd.nextInt(2)))
      (i.toLong, leg, rnd.nextInt(7).toLong)
    }.toDF("id", "leg", "v").repartition(13)
    val order = Seq(col("v").asc, col("id").asc)
    val got = RankOps.distributionRanksPer(df, "leg", order,
        10, "tile", "pr", "cd")
      .select("leg", "id", "tile", "pr", "cd")
      .as[(Option[String], Long, Int, Double, Double)].collect()
      .map { case (l, i, t, p, c) => (l, i) -> ((t, p, c)) }.toMap
    val w = Window.partitionBy("leg").orderBy(order: _*)
    val want = df
      .withColumn("tile", ntile(10).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select("leg", "id", "tile", "pr", "cd")
      .as[(Option[String], Long, Int, Double, Double)].collect()
      .map { case (l, i, t, p, c) => (l, i) -> ((t, p, c)) }.toMap
    assert(got.size == 4000 && got == want)
  }

  test("globalRowNumber on empty input returns empty with the rank column") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double)].toDF("id", "score")
    val out = RankOps.globalRowNumber(df, Seq(col("score").desc), "r")
    assert(out.columns.toSeq == Seq("id", "score", "r"))
    assert(out.count() == 0)
  }

  test("per-leg broadcast guard fails fast with a named error past the gate") {
    import spark.implicits._
    // the offsets/sizes tables are COLLECTED AND BROADCAST — a
    // doc_id-grade legCol must die with a named, actionable error
    // before the driver collect, not an opaque broadcast-wall OOM
    spark.conf.set(RankOps.MaxBroadcastRowsConf, "50")
    try {
      val df = (1 to 500).map(i => (i.toLong, i.toLong % 300, 1L))
        .toDF("id", "leg", "v").repartition(7)
      Seq(
        ("globalRowNumberPer", () =>
          RankOps.globalRowNumberPer(df, "leg", Seq(col("id").asc), "r")
            .count()),
        ("runningSumPer", () =>
          RankOps.runningSumPer(df, "leg", Seq(col("id").asc), "v", "c")
            .count())
      ).foreach { case (op, run) =>
        val e = intercept[Throwable] { run() }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
          .mkString("\n")
        assert(msgs.contains(s"RankOps.$op"), s"$op: unnamed failure:\n$msgs")
        assert(msgs.contains(RankOps.MaxBroadcastRowsConf),
          s"$op: error must name the gate conf:\n$msgs")
        assert(msgs.contains("'leg'"), s"$op: error must name the column")
      }
      // under the gate the guard is transparent: same ranks as ungated
      spark.conf.set(RankOps.MaxBroadcastRowsConf,
        RankOps.MaxBroadcastRowsDefault.toString)
      val ok = RankOps.globalRowNumberPer(df, "leg", Seq(col("id").asc), "r")
      assert(ok.count() == 500)
    } finally spark.conf.unset(RankOps.MaxBroadcastRowsConf)
  }

  test("boundedUserHistory equals the window keep-last-N, without a window") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // the bot regime in miniature: user 7 owns ~half the rows; heavy ts
    // ties broken by event_id (the operator's total-order contract);
    // several users have fewer rows than N (keep-all edge)
    val df = (1 to 4000).map { i =>
      val u = if (rnd.nextInt(2) == 0) 7L else rnd.nextInt(60).toLong
      (u, i.toLong, rnd.nextInt(40).toLong)
    }.toDF("user_id", "event_id", "ts").repartition(11)
    val n = 5
    val got = RankOps.boundedUserHistory(df, "user_id", "ts", "event_id", n)
    assert(got.columns.toSeq == df.columns.toSeq)
    val gotSet = got.select("user_id", "event_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") <= n).select("user_id", "event_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSet == want)
    // the scale claim: a bounded-heap AGGREGATE with a map-side partial
    // step, not a per-user window sort (one unsplittable task per bot)
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "boundedUserHistory must not window")
    assert(p.contains("partial_collect_top_k"),
      s"expected a partial bounded-heap aggregate:\n${p.take(1200)}")
  }

  test("the correctness pin is present: both branches read checkpointed rows") {
    // the offsets branch and the main branch must consume the PINNED
    // (_pid, _mono) rows (object scaladoc) — if the localCheckpoint is
    // ever removed, the ranked frame's plan reverts to a live range
    // exchange and this pin-detector fails before any rare AQE
    // divergence could misrank in production
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 11).toDouble))
      .toDF("id", "score")
    Seq(
      RankOps.globalRowNumber(df, Seq(col("score").desc, col("id").asc), "r"),
      RankOps.globalRowNumberPer(df.withColumn("leg", col("id") % 2),
        "leg", Seq(col("score").desc, col("id").asc), "r")
    ).foreach { out =>
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("Scan ExistingRDD"), s"pin missing:\n${p.take(800)}")
      assert(!p.contains("rangepartitioning"),
        "ranked rows must come from the pin, not a live range exchange")
    }
  }
}
