package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector codec + cosine kernels.
  *
  * All of them stay inside whole-stage codegen by emitting a single static
  * call into [[VectorKernels]] — no interpreted UDF boxing in the hot path.
  * Semantics documented in VectorKernels (parity with the reference's
  * compute/quantization.go and compute/cosine.go).
  */

private object Kern { val N = "graft.functions.VectorKernels" }

/** cosine_sim(array<float>, array<float>) → double */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.twoFloatArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineAD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${Kern.N}.cosineAD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_sim_q(binary, binary) → double — fused dequantize + cosine over
  * packed `[f32 min][f32 max][codes]` vectors. */
case class CosineSimQ(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(left -> BinaryType, right -> BinaryType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim_q"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineQ(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${Kern.N}.cosineQ($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** quantize_vec(array<float>) → binary(dim+8) */
case class QuantizeVec(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> ArrayType(FloatType)))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_vec"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.quantizeAD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"${Kern.N}.quantizeAD($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dequantize_vec(binary) → array<float> */
case class DequantizeVec(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> BinaryType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dequantize_vec"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.dequantizeAD(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"${Kern.N}.dequantizeAD($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** l2_normalize(array<float>) → array<float>, zero-norm safe */
case class L2Normalize(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> ArrayType(FloatType)))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.l2NormalizeAD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"${Kern.N}.l2NormalizeAD($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nfc_normalize(string) → string — Unicode NFC canonical composition
  * (see TextKernels.nfcU). Stays in whole-stage codegen via the static
  * kernel call like every expression here. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> StringType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.nfcU(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.nfcU($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** noop_embed(string) → binary(8+512) — deterministic fake embedder
  * mirroring the reference's noop provider shape (noop/ai.go:47-64). */
case class NoopEmbed(child: Expression, dim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> StringType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "noop_embed"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.noopEmbed(a.asInstanceOf[UTF8String].toString, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"${Kern.N}.noopEmbed($a.toString(), $dim)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_merge_pass(array<string>) → array<string> with the merge pair
  * (a, b) embedded as expression constants (the pair is one learned
  * rule, not data) — one left-to-right greedy pass of BPE tokenizer
  * training ([[TextKernels.bpeMergePass]]), inside whole-stage codegen. */
case class BpeMergePass(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_pass expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_merge_pass"
  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  override protected def nullSafeEval(v: Any): Any =
    TextKernels.bpeMergePass(v.asInstanceOf[ArrayData], ua, ub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ar = ctx.addReferenceObj("bpeA", ua, "org.apache.spark.unsafe.types.UTF8String")
    val br = ctx.addReferenceObj("bpeB", ub, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.TextKernels.bpeMergePass($v, $ar, $br)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** unigram_segment(string) → array<string> — Viterbi segmentation under
  * a learned unigram piece LM ([[TextKernels.unigramViterbi]], Kudo 2018).
  * The trained vocabulary rides as an expression constant, like
  * [[BpeMergePass]]'s merge pair: it is a bounded model artifact
  * (≤ vocabSize entries), not data, so it ships once per plan and the
  * codegen'd row loop only does the hash-probe DP — no per-row boxing,
  * no join against a vocabulary table. */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Double)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"
  @transient private lazy val table = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }
  @transient private lazy val maxLen =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max
  override protected def nullSafeEval(v: Any): Any =
    TextKernels.unigramViterbi(v.asInstanceOf[UTF8String], table, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", table, "java.util.HashMap")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.TextKernels.unigramViterbi($v, $ref, $maxLen)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bloom_might_contain(bigint) → boolean — probe a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] from inside whole-stage
  * codegen. The filter ships once per executor via the broadcast (the
  * codegen'd row loop only calls `mightContainLong`), so a 100M-item /
  * 1% fpp filter (~115 MB) is a per-executor constant, never per-task
  * state — the runtime-filter shape Spark itself uses for join pruning,
  * exposed here as a first-class pre-shuffle prune (DedupQueries q87). */
case class BloomMightContain(
    child: Expression,
    bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child -> LongType))
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(h: Any): Any =
    bf.value.mightContainLong(h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bf,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, h =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainLong($h)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Manual input-type checks (AbstractDataType is private[sql] in Spark 4,
  * so ExpectsInputTypes is unavailable to third-party expressions). */
private[functions] object GraftExprChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckSuccess, TypeCheckFailure}

  private def floatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def twoFloatArrays(name: String, l: Expression, r: Expression): TypeCheckResult =
    if (floatArray(l.dataType) && floatArray(r.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$name expects (array<float>, array<float>), got (${l.dataType.sql}, ${r.dataType.sql})")

  def expect(name: String, pairs: Seq[(Expression, DataType)]): TypeCheckResult = {
    val bad = pairs.find { case (e, t) =>
      t match {
        case ArrayType(FloatType, _) => !floatArray(e.dataType)
        case StringType => !e.dataType.isInstanceOf[StringType]
        case other => e.dataType != other
      }
    }
    bad match {
      case Some((e, t)) =>
        TypeCheckFailure(s"$name expects ${t.sql}, got ${e.dataType.sql}")
      case None => TypeCheckSuccess
    }
  }
}
