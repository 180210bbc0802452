package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Exact distributed PCA over an embedding column — the dimensionality
  * reduction / whitening step in front of indexing and semantic dedup
  * (reduce 768-dim encoder outputs to the 64-128 dims an IVF/PQ index
  * actually needs; complements OPQ, which rotates WITHIN a fixed dim).
  *
  * Scale shape: ONE corpus pass computes (n, Σx, upper-triangle ΣxxT)
  * through a partial-merged Aggregator — the shuffle carries one
  * d(d+3)/2-double buffer per task, never rows; the d×d eigenproblem is
  * driver-side (cyclic Jacobi, deterministic, no external solver), the
  * same bounded-driver-work pattern as the k-means/BPE/OPQ trainers.
  * Projection is a row-local matmul. Nothing here estimates: moments
  * are exact f64 sums, so the only cross-run noise is float summation
  * order (~ulp), which the spec's tolerances absorb.
  */
object Pca {

  /** mean: column means; components: top-k eigenvectors of the sample
    * covariance ROWS (orthonormal, eigenvalue-descending, sign-fixed so
    * each row's largest-|coeff| entry is positive); eigenvalues: the
    * matching variances. */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
    def project(x: Array[Float]): Array[Float] = {
      val out = new Array[Float](k)
      var c = 0
      while (c < k) {
        val row = components(c)
        var s = 0.0
        var i = 0
        while (i < dim) { s += (x(i) - mean(i)) * row(i); i += 1 }
        out(c) = s.toFloat
        c += 1
      }
      out
    }
    /** Back-projection into the original space (for reconstruction-error
      * accounting): mean + Σ_c z_c · v_c. */
    def reconstruct(z: Array[Float]): Array[Double] = {
      val out = mean.clone()
      var c = 0
      while (c < k) {
        var i = 0
        while (i < dim) { out(i) += z(c) * components(c)(i); i += 1 }
        c += 1
      }
      out
    }
  }

  /** Single-pass moment accumulator: buffer = [n, Σx(d), ΣxxT upper(d(d+1)/2)]. */
  private class MomentsAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val tri = d * (d + 1) / 2
    def zero: Array[Double] = new Array[Double](1 + d + tri)
    def reduce(b: Array[Double], x: Seq[Float]): Array[Double] = {
      require(x.length == d, s"dim ${x.length} != $d")
      b(0) += 1
      val xs = new Array[Double](d)
      var i = 0
      while (i < d) { xs(i) = x(i); b(1 + i) += xs(i); i += 1 }
      var p = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(p) += xs(i) * xs(j); p += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Double]): Array[Double] = b
    def bufferEncoder = ExpressionEncoder[Array[Double]]()
    def outputEncoder = ExpressionEncoder[Array[Double]]()
  }

  /** The single-pass moments frame (exposed for the plan-shape spec). */
  private[graft] def momentsFrame(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val agg = udaf(new MomentsAgg(d), ExpressionEncoder[Seq[Float]]())
    df.select(agg(col(vecCol)).as("m"))
  }

  /** Fit the top-k model in one distributed pass + a driver eigensolve. */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val head = df.select(vecCol).take(1)
    require(head.nonEmpty, "PCA on an empty frame")
    val d = head(0).getSeq[Float](0).length
    val m = momentsFrame(df, vecCol, d).head().getSeq[Double](0).toArray
    modelFromMoments(m, d, k)
  }

  /** Solve the model from a raw moments buffer ([n, Σx, ΣxxT upper]) —
    * the buffer is ADDITIVE across any partitioning of the corpus, so
    * incremental maintenance (the streaming moments tracker) merges
    * buffers element-wise and refits without re-scanning history. */
  def modelFromMoments(m: Array[Double], d: Int, k: Int): Model = {
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    require(m.length == 1 + d + d * (d + 1) / 2, "moments buffer shape")
    val n = m(0)
    require(n > 1, "PCA needs at least 2 rows")
    val mean = Array.tabulate(d)(i => m(1 + i) / n)
    // covariance from raw moments: cov(i,j) = ΣxxT(i,j)/n − mean_i·mean_j
    val cov = Array.ofDim[Double](d, d)
    var p = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m(p) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        p += 1
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigSym(cov)
    val order = vals.indices.sortBy(idx => (-vals(idx), idx)).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(d)(r => vecs(r)(idx))
      // sign convention: largest-|coeff| entry positive → deterministic
      // up to the eigensolve itself
      var best = 0
      var bi = 0
      while (bi < d) { if (math.abs(v(bi)) > math.abs(v(best))) best = bi; bi += 1 }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.map(vals).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). O(d³) per sweep, converges in
    * ~log(d) sweeps — milliseconds at d ≤ 1024, driver-side like every
    * trainer here. */
  private[operators] def jacobiEigSym(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, frob(a))
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // 2×2 rotation zeroing a(p,q)
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frob(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Row-local projection column (array<float> of length model.k). */
  def projectCol(model: Model): Column => Column = {
    val bc = model
    val u = udf((x: Seq[Float]) => bc.project(x.toArray))
    u(_)
  }

  /** Project an embedding column: df + outCol = top-k PCA coordinates. */
  def project(df: DataFrame, vecCol: String, model: Model,
      outCol: String): DataFrame =
    df.withColumn(outCol, projectCol(model)(col(vecCol)))
}
