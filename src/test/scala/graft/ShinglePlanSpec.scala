package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The containment family's shingle-df pass must be a PARTIAL groupBy
  * aggregate joined back — never a `count().over(Window.partitionBy
  * ("s"))`. Window partitions get no map-side combine and are not
  * AQE-splittable: one crawl-scale boilerplate shingle (df in the
  * billions) would funnel through a single task before the df cap could
  * discard it. This spec pins the shape in the physical plan so the
  * window form cannot creep back:
  *  - no WindowExec anywhere partitions by the shingle column;
  *  - the df aggregate runs in partial (map-side) + final mode.
  * Behavior (oracle parity across q118/q118b/q121/q123/q124/q126) is
  * gated separately by the registry; the hot-key wall-clock evidence
  * lives in ContainScaleProbe's hot regime (BASELINE.md). */
class ShinglePlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def windowsOn(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case w: WindowExec => w.partitionSpec.map(_.sql).mkString(",")
    }

  test("attachDf is window-free and aggregates df map-side") {
    import spark.implicits._
    val ex = Seq((1L, "a b c"), (1L, "b c d"), (2L, "a b c"))
      .toDF("doc_id", "s")
    val plan = DedupQueries.attachDf(ex, cap = Some(64L))
    assert(windowsOn(plan).isEmpty, plan.queryExecution.sparkPlan.toString)
    val aggModes = plan.queryExecution.sparkPlan.collect {
      case a: BaseAggregateExec => a.aggregateExpressions.map(_.mode.toString)
    }.flatten
    assert(aggModes.contains("Partial") && aggModes.contains("Final"),
      s"df pass must partial-aggregate map-side, saw modes: $aggModes")
    // and it still computes the right thing
    val got = DedupQueries.attachDf(ex, cap = None).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, "a b c") -> 2L, (2L, "a b c") -> 2L,
      (1L, "b c d") -> 1L))
  }

  test("no containment-family query windows over the shingle key") {
    // containmentShingles is the one place the family computes df over
    // raw exploded shingles; its plan (pre-checkpoint, so the df pass is
    // visible) must window only per-document
    import spark.implicits._
    val docs = (1 to 30).map(i => (i.toLong, s"t$i u$i v$i w$i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s0").as("source"), length(col("text")).as("n_chars"))
    val sh = DedupQueries.containmentShingles(docs)
    val wins = windowsOn(sh)
    assert(wins.nonEmpty, "expected the per-doc size window to remain")
    wins.foreach { w =>
      val cols = w.split(",").map(_.replaceAll("`", "").trim)
      assert(!cols.contains("s") && cols.contains("doc_id"),
        s"shingle-key window crept back: $w")
    }
  }
}
