package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

import graft.functions.{gf, VectorKernels}

/** Product quantization — the ANN compression step BEYOND the
  * reference's uint8 scalar codec (compute/quantization.go keeps one
  * byte per DIMENSION; PQ keeps one byte per SUBSPACE). A dim-64
  * vector compresses to m=8 bytes (32× vs float32, 8× vs the scalar
  * codec), which is what makes a 100 TB embedding corpus rankable
  * from memory: the ADC pass reads ONLY the m-byte code column, and
  * scoring a code is m table lookups into a query-specific LUT — no
  * decode, no float vector in the hot loop.
  *
  * Training is per-subspace Euclidean k-means (Lloyd's) over a seeded
  * driver-side sample of L2-NORMALIZED vectors (same bounded-sample
  * policy as IvfIndex M1); inner product against normalized inputs
  * makes ADC approximate cosine. Everything is deterministic: seeded
  * sample, first-k-distinct init, ties to the lowest code.
  *
  * Search is the standard two-stage shape: (1) ADC over codes →
  * TakeOrdered shortlist of k·rerank ids (the corpus-sized pass
  * touches m bytes/row); (2) exact cosine rerank of the shortlist via
  * a broadcast semi-join back to the full vectors. Recall/compression
  * /plan-shape proven in PqCodecSpec; q89 registers the end-to-end
  * search (golden-gated — ANN has no SQL oracle, same policy as q26).
  */
object PqCodec {

  /** Codebooks: m subspaces × k centroids × dsub floats. */
  final case class Model(dim: Int, m: Int,
                         codebooks: Array[Array[Array[Float]]])
      extends Serializable {
    def dsub: Int = dim / m
    def k: Int = codebooks(0).length

    /** Nearest-centroid code per subspace (L2; ties → lowest code). */
    def encode(v: Array[Float]): Array[Byte] = {
      val out = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val cb = codebooks(s)
        val off = s * dsub
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < cb.length) {
          val c = cb(j)
          var d = 0.0
          var t = 0
          while (t < dsub) {
            val diff = v(off + t) - c(t); d += diff * diff; t += 1
          }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }

    /** Codegen entry: ArrayData in, normalized, encoded. */
    def encodeAD(v: ArrayData): Array[Byte] =
      encode(VectorKernels.l2Normalize(v.toFloatArray()))

    /** Reconstruction: concatenated chosen centroids. */
    def decode(code: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var s = 0
      while (s < m) {
        System.arraycopy(codebooks(s)(code(s) & 0xff), 0, out, s * dsub, dsub)
        s += 1
      }
      out
    }

    /** Query LUT: flat m·k doubles, lut(s·k + j) = <q_sub_s, C_s_j>.
      * Double entries so ADC == dot(q, decode(code)) EXACTLY (same
      * per-subspace partials, same summation order). */
    def lut(query: Array[Float]): Array[Double] = {
      val qn = VectorKernels.l2Normalize(query)
      val out = new Array[Double](m * k)
      var s = 0
      while (s < m) {
        val cb = codebooks(s)
        val off = s * dsub
        var j = 0
        while (j < cb.length) {
          val c = cb(j)
          var d = 0.0
          var t = 0
          while (t < dsub) { d += qn(off + t).toDouble * c(t); t += 1 }
          out(s * k + j) = d
          j += 1
        }
        s += 1
      }
      out
    }
  }

  /** Seeded per-subspace Euclidean Lloyd's over an L2-normalized
    * sample. k ≤ 256 (codes are bytes). */
  def train(sample: Array[Array[Float]], m: Int, k: Int = 256,
            maxIter: Int = 15, seed: Long = 42L): Model = {
    require(sample.nonEmpty, "PQ training needs a non-empty sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(k <= 256, "PQ codes are single bytes")
    val dsub = dim / m
    val normed = sample.map(VectorKernels.l2Normalize)
    val codebooks = Array.tabulate(m) { s =>
      val sub = normed.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloydL2(sub, k, maxIter, seed + s)
    }
    Model(dim, m, codebooks)
  }

  /** Plain Euclidean Lloyd's: seeded shuffle, first-k-distinct init,
    * empty clusters keep their previous center. Deterministic. */
  private def lloydL2(xs: Array[Array[Float]], k: Int, maxIter: Int,
                      seed: Long): Array[Array[Float]] = {
    val d = xs(0).length
    val rnd = new scala.util.Random(seed)
    val order = rnd.shuffle(xs.indices.toVector)
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
    order.iterator.takeWhile(_ => init.length < k).foreach { i =>
      val key = xs(i).toSeq
      if (!seen(key)) { seen += key; init += xs(i).clone() }
    }
    var centers = init.toArray
    var iter = 0
    var moved = true
    // r18: the argmin pass (n·k·d — the train's hot loop, ~99% of
    // opq_train_s) is read-only and index-addressed, so running it on
    // the common pool is BIT-IDENTICAL at any thread/core count; the
    // order-sensitive FP accumulation below stays sequential in sample
    // order, preserving the seeded models (and the golden rows) exactly.
    val assign = new Array[Int](xs.length)
    while (moved && iter < maxIter) {
      val cs = centers
      java.util.stream.IntStream.range(0, xs.length).parallel().forEach { i =>
        val v = xs(i)
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < cs.length) {
          val c = cs(j)
          var dist = 0.0
          var t = 0
          while (t < d) { val df = v(t) - c(t); dist += df * df; t += 1 }
          if (dist < bestD) { bestD = dist; best = j }
          j += 1
        }
        assign(i) = best
      }
      val sums = Array.ofDim[Double](centers.length, d)
      val counts = new Array[Long](centers.length)
      var i = 0
      while (i < xs.length) {
        val v = xs(i)
        val acc = sums(assign(i))
        var t = 0
        while (t < d) { acc(t) += v(t); t += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      val next = centers.indices.map { j =>
        if (counts(j) == 0) centers(j)
        else Array.tabulate(d)(t => (sums(j)(t) / counts(j)).toFloat)
      }.toArray
      moved = next.zip(centers).exists { case (a, b) => !a.sameElements(b) }
      centers = next
      iter += 1
    }
    centers
  }

  /** `array<float>` → m-byte PQ code (normalizes, then encodes). */
  def pq_encode(vec: Column, model: Model): Column =
    shim.column(PqEncode(shim.expression(vec), model))

  /** m-byte code → approximate cosine vs the LUT's query. */
  def adc_dot(code: Column, lutFlat: Array[Double]): Column =
    shim.column(PqAdcDot(shim.expression(code), lutFlat))

  /** Two-stage PQ search over an encoded index frame: ADC shortlist of
    * k·rerank by TakeOrdered (reads only the code column), then exact
    * cosine rerank through a broadcast id semi-join back to the full
    * vectors. Returns (idCol, sim) — top-k, ties (sim, id ASC). */
  def searchAdc(index: DataFrame, idCol: String, codeCol: String,
                vecCol: String, model: Model, query: Array[Float],
                k: Int, rerank: Int = 4): DataFrame =
    searchAdcLut(index, idCol, codeCol, vecCol, model.lut(query), query,
      k, rerank)

  /** [[searchAdc]] with a caller-supplied LUT — the ADC stage only needs
    * the codes and a query LUT, so OPQ ([[OpqCodec]]) reuses the whole
    * two-stage shape by lut-ing its rotated query; the exact rerank is
    * rotation-invariant (raw cosine on the stored vectors). */
  private[index] def searchAdcLut(index: DataFrame, idCol: String,
                codeCol: String, vecCol: String, lutFlat: Array[Double],
                query: Array[Float], k: Int, rerank: Int): DataFrame = {
    val shortlist = index
      .select(col(idCol), adc_dot(col(codeCol), lutFlat).as("_adc"))
      .orderBy(col("_adc").desc, col(idCol).asc)
      .limit(k * rerank)
      .select(idCol)
    val qlit = lit(VectorKernels.l2Normalize(query))
    index.join(broadcast(shortlist), idCol)
      .select(col(idCol),
        gf.cosine_sim(col(vecCol), qlit.cast(ArrayType(FloatType))).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-PQ: the composed 100 TB serving shape — the coarse quantizer
    * prunes to nprobe lists (on a centroid_id-partitioned store that is
    * PARTITION pruning: unprobed lists are never planned, exactly like
    * `IvfIndex.search`), then the ADC pass ranks only the probed lists'
    * codes and the exact rerank touches k·rerank full vectors. Stacked
    * reductions: 100 TB of floats → nprobe/k of the corpus → m bytes
    * per row → k·rerank rows. `indexed` is an IVF-assigned frame
    * (`centroid_id` column) carrying a PQ code column. */
  def searchIvfAdc(indexed: DataFrame, ivf: IvfIndex.Model, idCol: String,
                   codeCol: String, vecCol: String, model: Model,
                   query: Array[Float], k: Int, nprobe: Int,
                   rerank: Int = 4): DataFrame = {
    val probeIds = ivf.probe(query, nprobe)
    searchAdc(indexed.filter(col("centroid_id").isin(probeIds: _*)),
      idCol, codeCol, vecCol, model, query, k, rerank)
  }
}

/** pq_encode(array<float>) → binary(m) — normalize + per-subspace argmin. */
case class PqEncode(child: Expression, model: PqCodec.Model)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(a: Any): Any =
    model.encodeAD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, "graft.index.PqCodec$Model")
    defineCodeGen(ctx, ev, a => s"$ref.encodeAD($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  // codebooks are semantic state; arrays lack value equality
  override def equals(o: Any): Boolean = o match {
    case PqEncode(c, m2) => c == child && (m2 eq model)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + model.dim
}

/** pq_adc(binary) → double — Σ_s lut(s·k + code_s), the ADC kernel. */
case class PqAdcDot(child: Expression, lutFlat: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects binary, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(a: Any): Any =
    PqAdcDot.adc(a.asInstanceOf[Array[Byte]], lutFlat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcLut", lutFlat, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.index.PqAdcDot.adc($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def equals(o: Any): Boolean = o match {
    case PqAdcDot(c, l) => c == child && java.util.Arrays.equals(l, lutFlat)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + lutFlat.length
}

object PqAdcDot {
  /** k is lut.length / m; codes index subspace s at lut[s·k + code]. */
  def adc(code: Array[Byte], lut: Array[Double]): Double = {
    val k = lut.length / code.length
    var s = 0
    var sum = 0.0
    while (s < code.length) { sum += lut(s * k + (code(s) & 0xff)); s += 1 }
    sum
  }
}
