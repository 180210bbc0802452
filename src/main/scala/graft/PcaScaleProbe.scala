package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PCA-at-scale probe: one-pass moment fit over an N×64 anisotropic
  * corpus with PLANTED factor structure (4 orthogonal directions at
  * variance scales 64/16/4/1 over a 0.05² noise floor), cold over
  * on-disk parquet. Asserts the planted structure is RECOVERED — top-4
  * eigenvalues separate from the noise floor and the planted directions
  * lie in the learned top-4 subspace — so the timing is of a correct
  * fit, then prints one JSON line for BASELINE.md.
  *
  * Corpus synthesis is pure codegen expressions (hash-derived uniform
  * factors × broadcast literal direction arrays) — no UDF, no driver
  * loop; the fit itself is the shipped [[graft.operators.Pca.fit]]:
  * ONE partial-merged aggregation whose shuffle carries a single
  * 2,145-double buffer per task.
  *
  * Usage: runMain graft.PcaScaleProbe [nRows]
  */
object PcaScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 4 orthonormal planted directions (seeded Gram-Schmidt, driver-side)
    val rnd = new scala.util.Random(19L)
    val dirs = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    while (dirs.length < 4) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      dirs.foreach { u =>
        val d = v.zip(u).map { case (a, b) => a * b }.sum
        (0 until dim).foreach(i => v(i) -= d * u(i))
      }
      val nrm = math.sqrt(v.map(x => x * x).sum)
      if (nrm > 1e-6) dirs += v.map(_ / nrm)
    }
    val scales = Array(8.0, 4.0, 2.0, 1.0) // stddev per factor

    val dir = java.nio.file.Files.createTempDirectory("pca_probe").toString
    var t0 = System.nanoTime()
    // factor f_k(id) ~ uniform(-√3·s, √3·s) (variance s²); embedding =
    // Σ f_k·dir_k + small hash noise — all codegen expressions
    val dirCols = dirs.zipWithIndex.map { case (d, k) =>
      lit(d.map(_.toFloat)).as(s"d$k")
    }.toSeq
    val factorExprs = scales.zipWithIndex.map { case (s, k) =>
      val u = s"(pmod(hash(vec_id * ${1009 + k}), 100000) / 100000.0 - 0.5)"
      s"($u * ${2 * math.sqrt(3.0) * s})"
    }
    val noise = "(pmod(hash(vec_id * 7919 + i), 1000) / 1000.0 - 0.5) * 0.1"
    spark.range(n)
      .select(col("id").as("vec_id") +: dirCols: _*)
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), i -> cast(
           |  ${factorExprs.zipWithIndex.map { case (f, k) =>
                s"$f * element_at(d$k, i + 1)" }.mkString(" + ")}
           |  + $noise as float))""".stripMargin))
      .select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/vecs.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9

    val vecs = spark.read.parquet(s"$dir/vecs.parquet")
    t0 = System.nanoTime()
    val model = graft.operators.Pca.fit(vecs, "embedding", 8)
    val fitSec = (System.nanoTime() - t0) / 1e9

    // planted-structure floors: the timing must be of a CORRECT fit
    val ev = model.eigenvalues
    require(ev(3) > 0.5 && ev(4) < 0.01,
      s"planted 4-factor structure not recovered: ${ev.mkString(",")}")
    // each planted direction lies in the learned top-4 subspace
    dirs.foreach { d =>
      val cap = model.components.take(4).map { c =>
        math.pow(c.zip(d).map { case (a, b) => a * b }.sum, 2)
      }.sum
      require(cap > 0.999, s"planted direction only $cap captured")
    }
    // variance accounting: Σ top-4 λ ≈ Σ scales² (uniform factors)
    val planted = scales.map(s => s * s).sum
    require(math.abs(ev.take(4).sum - planted) / planted < 0.02,
      s"variance ${ev.take(4).sum} vs planted $planted")

    println(s"""{"probe":"pca_scale","n_rows":$n,"dim":$dim,""" +
      s""""gen_sec":$genSec,"fit_sec":$fitSec,""" +
      s""""top_eigenvalues":[${ev.take(5).map(v => f"$v%.4f").mkString(",")}]}""")
    spark.stop()
  }
}
