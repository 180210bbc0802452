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

  test("globalRowNumber on empty input returns empty with the rank column") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double)].toDF("id", "score")
    val out = RankOps.globalRowNumber(df, Seq(col("score").desc), "r")
    assert(out.columns.toSeq == Seq("id", "score", "r"))
    assert(out.count() == 0)
  }
}
