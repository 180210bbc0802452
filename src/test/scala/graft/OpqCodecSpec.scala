package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorKernels
import graft.index.{OpqCodec, PqCodec}

/** OPQ: the learned rotation is orthonormal, beats axis-aligned PQ on
  * correlated data at the same code size, keeps the ADC = rotated-dot
  * contract, and the two-stage search still finds the true neighbor. */
class OpqCodecSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  private val Dim = 64
  private val N = 1024

  /** Correlated anisotropic sample: x = A·g with a fixed seeded dense
    * mixing matrix A and unit gaussians g — dimensions are strongly
    * correlated and variance is NOT axis-aligned, the regime OPQ exists
    * for (plain PQ's fixed coordinate subspaces cut across the
    * correlation structure). Deterministic via seeded Random. */
  private lazy val sample: Array[Array[Float]] = {
    val rnd = new scala.util.Random(7L)
    val a = Array.fill(Dim, Dim)((rnd.nextGaussian() / math.sqrt(Dim)).toFloat)
    // skew the spectrum: weight mixing rows so a few directions dominate
    val w = Array.tabulate(Dim)(i => 1.0f / (1 + i / 4))
    Array.fill(N) {
      val g = Array.fill(Dim)(rnd.nextGaussian())
      Array.tabulate(Dim) { i =>
        var s = 0.0
        var j = 0
        while (j < Dim) { s += a(i)(j) * w(i) * g(j); j += 1 }
        s.toFloat
      }
    }
  }

  private lazy val opq = OpqCodec.train(sample, m = 8)
  private lazy val pq = PqCodec.train(sample, m = 8)

  test("the learned rotation is orthonormal") {
    val r = opq.rotation
    for (i <- 0 until Dim; j <- 0 until Dim) {
      var s = 0.0
      (0 until Dim).foreach(t => s += r(t)(i).toDouble * r(t)(j))
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(s - expect) < 1e-4, s"RtR($i,$j)=$s")
    }
  }

  test("OPQ reconstruction error beats plain PQ on correlated data") {
    val xs = sample.map(VectorKernels.l2Normalize)
    def pqMse(x: Array[Float]): Double = {
      val b = pq.decode(pq.encode(x))
      var d = 0.0
      (0 until Dim).foreach(i => d += (x(i) - b(i)) * (x(i) - b(i)))
      d
    }
    val opqErr = xs.map(opq.mse).sum / xs.length
    val pqErr = xs.map(pqMse).sum / xs.length
    assert(opqErr < pqErr,
      s"OPQ $opqErr must beat PQ $pqErr at the same code size")
  }

  test("ADC equals the dot product in the rotated space, bitwise") {
    val q = sample.head
    val lut = opq.lut(q)
    sample.take(50).foreach { v =>
      val y = opq.rotate(VectorKernels.l2Normalize(v))
      val code = opq.pq.encode(y)
      val adc = graft.index.PqAdcDot.adc(code, lut)
      // same contract as PqCodec: ADC == dot(rotated query, decode(code)),
      // mirroring Model.lut's normalize-rotate-normalize and its
      // per-subspace partial summation order exactly
      val b = opq.pq.decode(code)
      var expect = 0.0
      val dsub = opq.pq.dsub
      val qn = VectorKernels.l2Normalize(opq.rotate(VectorKernels.l2Normalize(q)))
      (0 until opq.pq.m).foreach { s =>
        var d = 0.0
        (0 until dsub).foreach(t => d += qn(s * dsub + t).toDouble * b(s * dsub + t))
        expect += d
      }
      assert(adc == expect, s"$adc != $expect")
    }
  }

  test("IVF-OPQ equals plain OPQ ADC at nprobe=all") {
    val df = sample.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("vec_id", "embedding")
    val (indexed0, ivf) = graft.index.IvfIndex.build(df, "embedding",
      graft.index.IvfIndex.Params(listSize = 64, sampleSize = N))
    val indexed = indexed0
      .withColumn("opqcode", OpqCodec.opq_encode(col("embedding"), opq))
      .localCheckpoint(true)
    val q = sample(29)
    val full = OpqCodec.searchAdc(indexed, "vec_id", "opqcode", "embedding",
      opq, q, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfAll = OpqCodec.searchIvfAdc(indexed, ivf, "vec_id", "opqcode",
      "embedding", opq, q, k = 5, nprobe = ivf.centroids.length)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == full)
    // pruned probes return a subset of the unpruned candidates' ids
    val pruned = OpqCodec.searchIvfAdc(indexed, ivf, "vec_id", "opqcode",
      "embedding", opq, q, k = 5, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.nonEmpty && pruned.subsetOf(
      indexed.filter(col("centroid_id").isin(ivf.probe(q, 1): _*))
        .select("vec_id").collect().map(_.getLong(0)).toSet))
  }

  test("two-stage OPQ search returns the true nearest neighbor first") {
    val df = sample.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("vec_id", "embedding")
      .withColumn("opqcode", OpqCodec.opq_encode(col("embedding"), opq))
      .localCheckpoint(true)
    val q = sample(17)
    val got = OpqCodec.searchAdc(df, "vec_id", "opqcode", "embedding",
      opq, q, k = 5).collect()
    assert(got.head.getLong(0) == 17L, "self-match must rank first")
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-6)
  }
}
