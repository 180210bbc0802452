package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dedup verdict queries' broadcast size gate
  * ([[graft.operators.DedupOps.gateBroadcast]]): on a MAJORITY-duplicate
  * corpus — the crawl regime where cluster members / victims stop being
  * "exception sets" — the forced-shuffle path must agree row-for-row
  * with the broadcast path, and its static plan must contain no
  * BroadcastExchange (the merge hint, not runtime luck, removes it). */
class DedupAdaptiveSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** 150 docs, 120 of them (80%) in 60 exact-duplicate pairs — exact
    * dups are simultaneously q22 near-dups (J = 1), q117/q124 cluster
    * members, and q121 containment victims (C = 1, equal sizes), so one
    * corpus exercises every gated join. Per-cluster unique vocabulary
    * keeps shingle df at 2 (no cross-cluster edges). */
  private lazy val dupDir: String = {
    import spark.implicits._
    val clustered = (0 until 60).flatMap { i =>
      val text = s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i"
      Seq((i * 2L, text), (i * 2L + 1, text))
    }
    val singles = (0 until 30).map { j =>
      (120L + j, s"solo${j}a solo${j}b solo${j}c solo${j}d solo${j}e")
    }
    val dir = java.nio.file.Files.createTempDirectory("dupheavy").toString
    (clustered ++ singles).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("gateBroadcast: large path is a broadcast-free sort-merge join, row-identical to the broadcast path") {
    import spark.implicits._
    val spine = spark.range(500).toDF("doc_id")
    val dim = spark.range(300).select(col("id").as("doc_id"), lit(true).as("hit"))
    def joined(limit: Long) =
      spine.join(graft.operators.DedupOps.gateBroadcast(dim, limit),
        Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("hit"))
    val small = joined(Long.MaxValue)
    val large = joined(0L)
    // sparkPlan (pre-exchange-insertion) names the join strategy; the
    // strategy, not runtime stats, is what the gate must flip
    assert(small.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    val largePlan = large.queryExecution.sparkPlan.toString
    assert(!largePlan.contains("BroadcastHashJoin"), largePlan)
    assert(largePlan.contains("SortMergeJoin"), largePlan)
    assert(rowsOf(small) == rowsOf(large))
  }

  test("planted corpus really is majority-duplicate") {
    val verdict = DedupQueries.q124DedupVerdict(spark, dupDir).localCheckpoint(true)
    val n = verdict.count()
    val inClusters = verdict.groupBy("cluster_id")
      .agg(count(lit(1)).as("sz")).filter(col("sz") > 1)
      .agg(sum("sz")).collect()(0).getLong(0)
    assert(n == 150)
    assert(inClusters * 2 >= n, s"only $inClusters of $n docs in clusters")
  }

  test("q124 forced-shuffle path is row-identical and broadcast-free in the static plan") {
    val bcast = DedupQueries.q124DedupVerdict(spark, dupDir, Long.MaxValue)
    val merge = DedupQueries.q124DedupVerdict(spark, dupDir, 0L)
    assert(rowsOf(bcast) == rowsOf(merge))
    val plan = merge.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(bcast.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    // every verdict survives the path flip: kept rows exist on both sides
    assert(merge.filter(col("keep")).count() > 0)
  }

  test("q117 and q121 forced-shuffle paths are row-identical") {
    assert(rowsOf(DedupQueries.q117BestRep(spark, dupDir, Long.MaxValue)) ==
      rowsOf(DedupQueries.q117BestRep(spark, dupDir, 0L)))
    assert(rowsOf(DedupQueries.q121Subsume(spark, dupDir, Long.MaxValue)) ==
      rowsOf(DedupQueries.q121Subsume(spark, dupDir, 0L)))
  }
}
