package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Session-extensions entry point: registers the engine's native
  * expressions as session builtins, so a cluster deploy needs only
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no driver code).
  * `gf.registerAll` remains for programmatic use on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.FuseVectorOps)
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_sim_q"),
      info("cosine_sim_q", "cosine_sim_q(a, b) - fused dequantize+cosine over packed vectors"),
      (es: Seq[Expression]) => CosineSimQ(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("quantize_vec"),
      info("quantize_vec", "quantize_vec(a) - pack float array to min/max+uint8 codes"),
      (es: Seq[Expression]) => QuantizeVec(es.head)))
    ext.injectFunction((FunctionIdentifier("dequantize_vec"),
      info("dequantize_vec", "dequantize_vec(b) - unpack quantized binary to float array"),
      (es: Seq[Expression]) => DequantizeVec(es.head)))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(a) - L2-normalize a float array"),
      (es: Seq[Expression]) => L2Normalize(es.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonical composition"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("noop_embed"),
      info("noop_embed", "noop_embed(text[, dim]) - deterministic fake embedding"),
      (es: Seq[Expression]) => es match {
        case Seq(t) => NoopEmbed(t, 512)
        case Seq(t, Literal(d: Int, _)) => NoopEmbed(t, d)
        case _ => throw new IllegalArgumentException("noop_embed(text[, dim])")
      }))
    ext.injectFunction((FunctionIdentifier("bpe_merge_pass"),
      info("bpe_merge_pass",
        "bpe_merge_pass(sym, 'a', 'b') - one greedy BPE merge pass over a symbol array"),
      (es: Seq[Expression]) => es match {
        case Seq(sym, Literal(a, _: org.apache.spark.sql.types.StringType),
            Literal(b, _: org.apache.spark.sql.types.StringType)) =>
          BpeMergePass(sym, a.toString, b.toString)
        case _ => throw new IllegalArgumentException(
          "bpe_merge_pass(sym, 'a', 'b') — the pair must be string literals")
      }))
    // engine marker: lets a deploy assert the extensions actually loaded
    ext.injectFunction((FunctionIdentifier("graft_engine_version"),
      info("graft_engine_version", "graft_engine_version() - engine version string"),
      (_: Seq[Expression]) => Literal.create("graft-0.2", org.apache.spark.sql.types.StringType)))
  }
}
