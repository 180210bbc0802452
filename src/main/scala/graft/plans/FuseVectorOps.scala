package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSim, CosineSimQ, DequantizeVec, L2Normalize}

/** Optimizer rule (injected via [[graft.GraftExtensions]]) fusing the
  * vector codec with the cosine kernel:
  *
  *  1. `cosine_sim(dequantize_vec(a), dequantize_vec(b))` →
  *     `cosine_sim_q(a, b)` — decodes inside the fused kernel instead of
  *     materializing two `array<float>` per row. BIT-EXACT: CosineSimQ
  *     decodes each code through the identical float32 expression and
  *     accumulates in the identical chain order (invariant pinned by
  *     VectorCodecSpec).
  *  2. `cosine_sim(l2_normalize(x), y)` → `cosine_sim(x, y)` (either
  *     side) — the cosine kernel divides by both norms itself, so
  *     pre-normalization is a redundant O(dim) pass. Exact in real
  *     arithmetic; float results may differ in the last ulps (well under
  *     the engine's 4-decimal output rounding).
  *
  * Users write the naive composition; the plan runs the fused kernel —
  * the Catalyst-idiomatic home for this rewrite (SURVEY §4.3).
  */
object FuseVectorOps extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSim(DequantizeVec(a), DequantizeVec(b)) => CosineSimQ(a, b)
    case CosineSim(L2Normalize(a), b) => CosineSim(a, b)
    case CosineSim(a, L2Normalize(b)) => CosineSim(a, b)
  }
}
