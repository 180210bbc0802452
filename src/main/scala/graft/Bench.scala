package graft
import org.apache.spark.sql.SparkSession
import graft.functions.VectorKernels

/** Perf harness: times every registered query at SPARK_GRAFT_SF_DIR, plus
  * the reference's prefTest micro-shapes (main.go:247-286, BASELINE.md):
  * 500x512 matrix-pair cosine x10 and 1000x512 (de)quantize round trips.
  * Emits ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/parquet-footer startup costs land
    // here, not on whichever query happens to iterate first
    try SparkEntry.queries.head._2(spark, sfDir).count() catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val micro = microBench()
    val ms = micro.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"micro":$ms,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Reference prefTest shapes, single-threaded JVM kernel time in
    * seconds per iteration (the reference logs the same wall-clocks at
    * startup over its noop provider). */
  private def microBench(): Map[String, Double] = {
    val rnd = new scala.util.Random(42)
    def mat(rows: Int, dim: Int): Array[Array[Float]] =
      Array.fill(rows)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    // warmup + measure: cosine of two 500x512 matrices (row x row argmax)
    val a = mat(500, 512)
    val b = mat(500, 512)
    def cosinePass(): Double = {
      var best = 0.0
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) {
          val s = VectorKernels.cosine(a(i), b(j))
          if (s > best) best = s
          j += 1
        }
        i += 1
      }
      best
    }
    cosinePass() // JIT warmup
    var t0 = System.nanoTime()
    var iter = 0
    while (iter < 10) { cosinePass(); iter += 1 }
    val cosSec = (System.nanoTime() - t0) / 1e9 / 10

    val vecs = mat(1000, 512)
    def quantPass(): Int = {
      var n = 0
      var i = 0
      while (i < vecs.length) { n += VectorKernels.quantize(vecs(i)).length; i += 1 }
      n
    }
    quantPass()
    t0 = System.nanoTime()
    iter = 0
    while (iter < 10) { quantPass(); iter += 1 }
    val qSec = (System.nanoTime() - t0) / 1e9 / 10

    val packed = vecs.map(VectorKernels.quantize)
    def dequantPass(): Int = {
      var n = 0
      var i = 0
      while (i < packed.length) { n += VectorKernels.dequantize(packed(i)).length; i += 1 }
      n
    }
    dequantPass()
    t0 = System.nanoTime()
    iter = 0
    while (iter < 10) { dequantPass(); iter += 1 }
    val dqSec = (System.nanoTime() - t0) / 1e9 / 10

    Map(
      "cosine_500x512_pair_sec_per_iter" -> cosSec,
      "quantize_1000x512_sec_per_iter" -> qSec,
      "dequantize_1000x512_sec_per_iter" -> dqSec)
  }
}
