package graft.index

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

import graft.functions.VectorKernels

/** Optimized Product Quantization (Ge et al., CVPR 2013 — the
  * non-parametric OPQ-NP loop): an orthonormal rotation learned IN FRONT
  * of the PQ codebooks, so the m independent subspaces cut the data
  * along directions that balance variance instead of whatever axes the
  * embedding happened to ship with. Same code size, lower quantization
  * error — the listed recall-per-byte upgrade over plain [[PqCodec]].
  *
  * Training alternates (sample-sized, on the driver — the same policy as
  * [[PqCodec.train]] and the IVF sample k-means): (1) rotate the sample,
  * (2) train PQ codebooks on the rotated data, (3) re-solve the rotation
  * as the orthogonal Procrustes problem against the reconstructions —
  * min_R ||R·X − B||_F has the closed form R = V·Uᵀ from
  * svd(Σ x·bᵀ) = U·S·Vᵀ. Everything downstream stays distributed and
  * codegen'd: encode is one matrix rotation (a plan reference object)
  * plus the PQ argmin per row, ADC reuses [[PqAdcDot]] verbatim with the
  * rotated query's LUT, and the exact rerank is rotation-invariant.
  */
object OpqCodec {

  final case class Model(rotation: Array[Array[Float]], pq: PqCodec.Model)
      extends Serializable {
    def dim: Int = pq.dim

    /** R·v (f64 accumulation per output coordinate). */
    def rotate(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](rotation.length)
      var i = 0
      while (i < rotation.length) {
        val row = rotation(i)
        var s = 0.0
        var j = 0
        while (j < row.length) { s += row(j).toDouble * v(j); j += 1 }
        out(i) = s.toFloat
        i += 1
      }
      out
    }

    /** Codegen entry: normalize → rotate → PQ-encode. */
    def encodeAD(v: ArrayData): Array[Byte] =
      pq.encode(rotate(VectorKernels.l2Normalize(v.toFloatArray())))

    /** Query LUT in the ROTATED space: ADC then estimates
      * <R·q, R·v> = <q, v> (rotation preserves dot products). */
    def lut(query: Array[Float]): Array[Double] =
      pq.lut(rotate(VectorKernels.l2Normalize(query)))

    /** Reconstruction error of one (already normalized) vector. */
    private[graft] def mse(x: Array[Float]): Double = {
      val y = rotate(x)
      val b = pq.decode(pq.encode(y))
      var d = 0.0
      var i = 0
      while (i < y.length) { val df = y(i) - b(i); d += df * df; i += 1 }
      d
    }
  }

  /** OPQ-NP training over a (seeded, deterministic) sample. */
  def train(sample: Array[Array[Float]], m: Int, k: Int = 256,
            opqIters: Int = 8, seed: Long = 42L): Model = {
    require(sample.nonEmpty, "OPQ training needs a non-empty sample")
    val xs = sample.map(VectorKernels.l2Normalize)
    val dim = xs(0).length
    var r = DenseMatrix.eye[Double](dim)
    def rotated(x: Array[Float]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += r(i, j) * x(j); j += 1 }
        out(i) = s.toFloat
        i += 1
      }
      out
    }
    var pq: PqCodec.Model = null
    var iter = 0
    // r18: per-sample rotate and encode/decode are independent and
    // index-addressed — common-pool parallel, bit-identical at any core
    // count; the order-sensitive mMat FP accumulation stays sequential
    // in sample order so the learned rotation (and goldens) is exact.
    def parRotate(src: Array[Array[Float]]): Array[Array[Float]] = {
      val out = new Array[Array[Float]](src.length)
      java.util.stream.IntStream.range(0, src.length).parallel()
        .forEach(n => out(n) = rotated(src(n)))
      out
    }
    while (iter < opqIters) {
      val ys = parRotate(xs)
      pq = PqCodec.train(ys, m, k, seed = seed)
      val pqF = pq
      val bs = new Array[Array[Float]](xs.length)
      java.util.stream.IntStream.range(0, xs.length).parallel()
        .forEach(n => bs(n) = pqF.decode(pqF.encode(ys(n))))
      // Procrustes step: M = Σ x·bᵀ, svd(M) = U·S·Vᵀ, R = V·Uᵀ
      val mMat = DenseMatrix.zeros[Double](dim, dim)
      var n = 0
      while (n < xs.length) {
        val x = xs(n)
        val b = bs(n)
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) { mMat(i, j) += x(i).toDouble * b(j); j += 1 }
          i += 1
        }
        n += 1
      }
      val svd.SVD(u, _, vt) = svd(mMat)
      r = vt.t * u.t
      iter += 1
    }
    // codebooks must match the FINAL rotation
    pq = PqCodec.train(parRotate(xs), m, k, seed = seed)
    Model(Array.tabulate(dim, dim)((i, j) => r(i, j).toFloat), pq)
  }

  /** `array<float>` → m-byte OPQ code (normalize → rotate → argmin). */
  def opq_encode(vec: Column, model: Model): Column =
    shim.column(OpqEncode(shim.expression(vec), model))

  /** Two-stage OPQ search: ADC over the rotated query's LUT (the shared
    * [[PqCodec.searchAdcLut]] shape), exact cosine rerank on the raw
    * stored vectors — rotation-invariant, so only the LUT changes. */
  def searchAdc(index: DataFrame, idCol: String, codeCol: String,
                vecCol: String, model: Model, query: Array[Float],
                k: Int, rerank: Int = 4): DataFrame =
    PqCodec.searchAdcLut(index, idCol, codeCol, vecCol, model.lut(query),
      query, k, rerank)

  /** IVF-OPQ: the coarse quantizer prunes lists in the ORIGINAL space
    * (centroid assignment is rotation-independent — the IVF model never
    * sees the rotation), then the OPQ ADC ranks only the probed lists'
    * codes. Same stacked-reduction shape as [[PqCodec.searchIvfAdc]]. */
  def searchIvfAdc(indexed: DataFrame, ivf: IvfIndex.Model, idCol: String,
                   codeCol: String, vecCol: String, model: Model,
                   query: Array[Float], k: Int, nprobe: Int,
                   rerank: Int = 4): DataFrame = {
    val probeIds = ivf.probe(query, nprobe)
    searchAdc(indexed.filter(
        org.apache.spark.sql.functions.col("centroid_id").isin(probeIds: _*)),
      idCol, codeCol, vecCol, model, query, k, rerank)
  }
}

/** opq_encode(array<float>) → binary(m) — rotate then per-subspace argmin. */
case class OpqEncode(child: Expression, model: OpqCodec.Model)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"opq_encode expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "opq_encode"
  override protected def nullSafeEval(a: Any): Any =
    model.encodeAD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("opqModel", model, "graft.index.OpqCodec$Model")
    defineCodeGen(ctx, ev, a => s"$ref.encodeAD($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  // rotation+codebooks are semantic state; arrays lack value equality
  override def equals(o: Any): Boolean = o match {
    case OpqEncode(c, m2) => c == child && (m2 eq model)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + model.dim
}
