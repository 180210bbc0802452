package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.{Column, DataFrame}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  /** Bit-by-bit Morton reference: bit i of a -> 2i, of b -> 2i+1. */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  test("morton2 matches the bit-by-bit reference on random 16-bit pairs") {
    val rnd = new scala.util.Random(11)
    val pairs = IndexedSeq.tabulate(2000) { i =>
      if (i < 8) (Seq(0, 65535, 1, 32768)(i % 4), Seq(0, 65535, 32768, 1)(i % 4))
      else (rnd.nextInt(65536), rnd.nextInt(65536))
    }
    val got = pairs.toDF("a", "b")
      .select(ZOrder.morton2(col("a"), col("b")).as("z"))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z == mortonRef(a, b), s"morton($a, $b)")
    }
  }

  test("morton2 walks the quadrant order on a 2x2 grid and stays in codegen") {
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1)).toDF("a", "b")
      .select(ZOrder.morton2(col("a"), col("b")).as("z"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L))
    // the ladder must be pure codegen'd expressions: no BatchEvalPython,
    // no ScalaUDF, single WholeStageCodegen over the project
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"), plan)
  }

  test("cluster costs exactly one exchange (the range partition)") {
    val df = spark.range(1000).select(
      pmod(hash(col("id")), lit(1024)).as("x"),
      pmod(hash(col("id"), lit(1)), lit(1024)).as("y"))
    val plan = ZOrder.cluster(df, col("x"), col("y"), 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, plan.take(2000))
    assert(plan.contains("rangepartitioning"), plan.take(2000))
  }

  // ---------- row-group pruning head-to-head ----------

  /** Rows the parquet scan actually materialized (after row-group
    * min/max skipping) for `pred` over `path` — the scan leaf's own
    * numOutputRows metric, read from the plan that just executed.
    * The query is scan+filter with no exchange, so AQE leaves the
    * plan non-adaptive and the leaf is the FileSourceScanExec. */
  private def scanned(path: String, pred: Column): (Long, Long) = {
    val df = spark.read.parquet(path).filter(pred)
    val kept = df.collect().length.toLong
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    (scan.metrics("numOutputRows").value, kept)
  }

  test("z-order layout prunes row groups on both dimensions") {
    val n = 1 << 18
    // deterministic uniform 2-D points in [0,1024)^2
    val pts = spark.range(n).select(
      pmod(hash(col("id")), lit(1024)).as("x"),
      pmod(hash(col("id"), lit(1)), lit(1024)).as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val (zDir, xDir, rDir) = (s"$base/z", s"$base/x", s"$base/r")
    // 16 files, one row group each: the pruning unit is the z-cell
    ZOrder.cluster(pts, col("x"), col("y"), 16).write.parquet(zDir)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(xDir)
    pts.repartition(16).write.parquet(rDir)

    val rect = col("x").between(96, 159) && col("y").between(320, 383)
    val (zRect, zKept) = scanned(zDir, rect)
    val (xRect, xKept) = scanned(xDir, rect)
    val (rRect, rKept) = scanned(rDir, rect)
    // same answer from every layout
    assert(zKept == rKept && xKept == rKept && zKept > 0)
    // the random layout overlaps every cell: scans ~everything; the
    // z-layout touches only the cells whose rectangle meets the query
    assert(rRect > n / 2, s"random layout should not prune: $rRect")
    assert(zRect <= n / 4, s"z-order rect scan too big: $zRect of $n")

    // a predicate on the SECOND dimension only: the x-sorted layout
    // cannot prune at all, the z-layout still skips 3 of 4 cell rows
    val yOnly = col("y").between(320, 383)
    val (zY, zYk) = scanned(zDir, yOnly)
    val (xY, xYk) = scanned(xDir, yOnly)
    assert(zYk == xYk && zYk > 0)
    assert(xY > n / 2, s"x-sorted layout should not prune on y: $xY")
    assert(zY <= xY / 2, s"z-order should beat 1-D sort on y-only: $zY vs $xY")
  }
}
