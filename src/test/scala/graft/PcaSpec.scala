package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

/** Gate for the distributed PCA trainer: eigen-structure correctness
  * against a driver-side recompute, subspace optimality, the
  * partial-merge plan shape, and the downstream payoff (reduced-dim
  * search keeps neighborhood structure on anisotropic data). */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val dim = 16

  /** Seeded anisotropic sample: variance concentrated on a few random
    * directions — the regime PCA exists for. */
  private lazy val sample: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(11L)
    val basis = Array.fill(4)(graft.functions.VectorKernels.l2Normalize(
      Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val scales = Array(8.0, 4.0, 2.0, 1.0)
    (0 until 2000).map { _ =>
      val x = new Array[Float](dim)
      basis.zip(scales).foreach { case (b, s) =>
        val g = rnd.nextGaussian() * s
        var i = 0
        while (i < dim) { x(i) += (g * b(i)).toFloat; i += 1 }
      }
      var i = 0
      while (i < dim) { x(i) += (rnd.nextGaussian() * 0.05).toFloat; i += 1 }
      x
    }
  }

  private lazy val df = {
    import spark.implicits._
    sample.map(_.toSeq).toDF("embedding")
  }

  private def covDriver(): Array[Array[Double]] = {
    val n = sample.length
    val mean = Array.tabulate(dim)(i => sample.map(_(i).toDouble).sum / n)
    Array.tabulate(dim, dim)((i, j) =>
      sample.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n)
  }

  test("components are orthonormal and satisfy the eigen equation") {
    val m = Pca.fit(df, "embedding", k = 6)
    for (a <- 0 until 6; b <- 0 until 6) {
      val dot = (0 until dim).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<$a,$b> = $dot")
    }
    val cov = covDriver()
    m.components.zip(m.eigenvalues).foreach { case (v, lam) =>
      val res = (0 until dim).map { i =>
        val cvi = (0 until dim).map(j => cov(i)(j) * v(j)).sum
        math.pow(cvi - lam * v(i), 2)
      }.sum
      assert(math.sqrt(res) < 1e-6 * math.max(1.0, lam), s"eigen residual for λ=$lam")
    }
    // eigenvalues descending, and the planted 4-direction structure shows:
    // the 5th value collapses to the 0.05-noise floor
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.eigenvalues(3) > 0.5 && m.eigenvalues(4) < 0.01,
      m.eigenvalues.mkString(","))
  }

  test("projection variance matches eigenvalues; k-dim subspace beats coordinates") {
    val k = 4
    val m = Pca.fit(df, "embedding", k)
    val proj = Pca.project(df, "embedding", m, "z")
      .select("z").collect().map(_.getSeq[Float](0).toArray)
    // variance along component c == λ_c (projection is exact, sample var)
    (0 until k).foreach { c =>
      val zs = proj.map(_(c).toDouble)
      val mu = zs.sum / zs.length
      val v = zs.map(z => (z - mu) * (z - mu)).sum / zs.length
      assert(math.abs(v - m.eigenvalues(c)) < 1e-3 * math.max(1.0, m.eigenvalues(c)),
        s"component $c variance $v vs λ ${m.eigenvalues(c)}")
    }
    // PCA-k captured variance ≥ ANY k-coordinate subset (subspace optimality)
    val cov = covDriver()
    val captured = m.eigenvalues.sum
    val rnd = new scala.util.Random(3L)
    (0 until 20).foreach { _ =>
      val coords = rnd.shuffle((0 until dim).toList).take(k)
      val axisVar = coords.map(i => cov(i)(i)).sum
      assert(captured >= axisVar - 1e-9)
    }
    // reconstruction error == total variance minus captured (Pythagoras)
    val total = (0 until dim).map(i => cov(i)(i)).sum
    val recon = sample.zip(proj).map { case (x, z) =>
      val back = m.reconstruct(z)
      (0 until dim).map(i => math.pow(x(i) - back(i), 2)).sum
    }.sum / sample.length
    assert(math.abs(recon - (total - captured)) < 1e-3 * total,
      s"recon $recon vs ${total - captured}")
  }

  test("fit is ONE corpus pass with map-side partial aggregation") {
    // the exact frame fit() executes: the moments aggregate must
    // partially combine below the single exchange — the shuffle carries
    // one fixed-width buffer per task, never rows
    val plan = Pca.momentsFrame(df, "embedding", dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"$exchanges exchanges in a single-agg plan:\n$plan")
  }

  test("incremental moments tracker refits the same model as one-shot fit") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files.createTempDirectory("pca_store").toString + "/m"
    val ckpt = java.nio.file.Files.createTempDirectory("pca_ckpt").toString
    val mem = MemoryStream[Seq[Float]](spark)
    val stream = mem.toDF().toDF("embedding")
    val chunks = sample.map(_.toSeq).grouped(700).toSeq
    chunks.foreach { c =>
      mem.addData(c: _*)
      graft.streaming.Streams.runMomentsTracker(stream, "embedding", dim, store, ckpt)
    }
    val inc = graft.streaming.Streams.pcaModel(spark, store, dim, 4)
    val one = Pca.fit(df, "embedding", 4)
    // moments are additive: the incremental model equals the one-shot
    // model up to f64 summation order
    inc.eigenvalues.zip(one.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, b), s"$a vs $b")
    }
    inc.components.zip(one.components).foreach { case (u, v) =>
      val dot = u.zip(v).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - 1.0) < 1e-6, s"component dot $dot")
    }
    assert(inc.mean.zip(one.mean).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("reduced-dim neighbor search keeps neighborhood structure") {
    // on the anisotropic sample, 6-dim PCA distances must rank the true
    // 16-dim nearest neighbor into the top-3 for most query points —
    // the property that makes PCA a legitimate pre-index step
    val m = Pca.fit(df, "embedding", 6)
    val xs = sample.take(200)
    val zs = xs.map(m.project)
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    var hits = 0
    (0 until 50).foreach { qi =>
      val trueNn = xs.indices.filter(_ != qi).minBy(j => d2(xs(qi), xs(j)))
      val top3 = xs.indices.filter(_ != qi).sortBy(j => d2(zs(qi), zs(j))).take(3)
      if (top3.contains(trueNn)) hits += 1
    }
    assert(hits >= 45, s"true NN in PCA top-3 for only $hits/50 queries")
  }
}
