package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.gf

/** The injected optimizer rule rewrites naive codec+cosine compositions
  * into the fused kernel without changing results. */
class FuseVectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def qdf = {
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings").limit(50)
    e.select(col("vec_id"), gf.quantize_vec(col("embedding")).as("qvec"))
      .localCheckpoint(true)
  }

  test("cosine over dequantize pairs fuses to cosine_sim_q, bit-identically") {
    val df = qdf
    val q = df.filter(col("vec_id") === 0).select(col("qvec").as("query"))
    val naive = df.crossJoin(broadcast(q))
      .select(col("vec_id"),
        gf.cosine_sim(gf.dequantize_vec(col("qvec")),
          gf.dequantize_vec(col("query"))).as("sim"))
    val optimized = naive.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim_q("), optimized)
    assert(!optimized.contains("dequantize_vec("), optimized)

    // results must be BIT-identical to the explicitly fused form
    val fused = df.crossJoin(broadcast(q))
      .select(col("vec_id"), gf.cosine_sim_q(col("qvec"), col("query")).as("sim"))
    val a = naive.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fused.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("redundant l2_normalize inside cosine is elided") {
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings").limit(50)
    val q = e.filter(col("vec_id") === 1).select(col("embedding").as("query"))
    val naive = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        gf.cosine_sim(gf.l2_normalize(col("embedding")),
          gf.l2_normalize(col("query"))).as("sim"))
    val optimized = naive.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("l2_normalize("), optimized)
    // same values to far beyond the engine's 4dp output rounding
    val plain = e.crossJoin(broadcast(q))
      .select(col("vec_id"), gf.cosine_sim(col("embedding"), col("query")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    naive.collect().foreach(r =>
      assert(math.abs(r.getDouble(1) - plain(r.getLong(0))) < 1e-9))
  }
}
