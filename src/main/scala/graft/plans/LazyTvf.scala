package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** Execution-deferred table-valued function node.
  *
  * The curation TVFs (`curation_verdict`, `bench_contain`,
  * `decontaminate_rewrite`) wrap pipelines whose DataFrame
  * CONSTRUCTION is itself corpus-scale work: their size gates pin
  * (localCheckpoint) and count intermediates to choose broadcast vs
  * sort-merge, so "build the plan" means "run the multi-stage verdict".
  * The r11 builders returned that constructed plan from the TVF
  * resolver — i.e. at SQL ANALYSIS time — which made even
  * `EXPLAIN SELECT * FROM curation_verdict('…')` execute minutes of
  * jobs (hours at 100 TB) and leak one set of pinned blocks per
  * invocation of a dashboard/retry-looped client.
  *
  * This node defers the whole build to EXECUTION: analysis produces
  * only a leaf carrying the declared output schema and a thunk;
  * optimization and physical planning (so every EXPLAIN tier) touch
  * nothing but the leaf; the first action's `doExecute` builds the
  * inner pipeline (its pins materialize there, execution-time) and
  * hands back its RDD. The inner frame is memoized per exec node, so
  * one query's repeated stage submissions reuse one build.
  *
  * The declared schema is a CONSTANT (the TVF contract — it cannot be
  * derived from the inner frame without building it); [[LazyTvfExec]]
  * fail-fasts at execution if the built pipeline ever drifts from it,
  * and `ExtensionsSpec` pins declared == library schema per TVF. */
final case class LazyTvfPlan(name: String, override val output: Seq[Attribute],
    build: SparkSession => DataFrame)
  extends LeafNode with MultiInstanceRelation {

  /** Self-joining the TVF needs fresh expression ids per instance. */
  override def newInstance(): LazyTvfPlan =
    copy(output = output.map(_.newInstance()))

  /** Two invocations of the same TVF with the same literal arguments
    * are the same relation — `name` embeds function + arguments, and
    * the pipelines are deterministic per (engine, inputs). The default
    * canonicalization would still tell them apart because `build` is a
    * fresh lambda per resolver call (reference equality), which breaks
    * `sameResult` and with it CACHE TABLE / CTAS-cache reuse — the
    * documented "run once, cache" recipe silently re-ran the pipeline
    * per read. Canonical form: positional expr ids + one shared
    * sentinel thunk, so equality reduces to (name, output shape). */
  override def doCanonicalize(): LogicalPlan =
    copy(output = output.zipWithIndex.map { case (a, i) =>
      a.withExprId(org.apache.spark.sql.catalyst.expressions.ExprId(i))
    }, build = LazyTvfPlan.CanonicalBuild)

  /** Unknown until built — the planner must NOT broadcast on stats it
    * cannot have, so advertise the conservative default size. */
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)

  override def simpleString(maxFields: Int): String = s"LazyTvf $name"
}

object LazyTvfPlan {
  /** Shared sentinel thunk for canonicalized plans — never invoked
    * (canonical plans are compared, not planned). */
  private[plans] val CanonicalBuild: SparkSession => DataFrame =
    _ => throw new IllegalStateException(
      "canonicalized LazyTvfPlan must not be executed")
}

/** Physical leaf for [[LazyTvfPlan]]: EXPLAIN prints this node and
  * stops; the first action triggers [[inner]]'s build. */
final case class LazyTvfExec(name: String, output: Seq[Attribute],
    build: SparkSession => DataFrame) extends LeafExecNode {

  /** The library pipeline, built ONCE per exec node at first execution
    * (`private[graft]` so ExtensionsSpec can assert the inner plan's
    * operator histogram equals the library's). */
  @transient private[graft] lazy val inner: DataFrame = {
    val df = build(session)
    val got = df.schema.map(f => (f.name, f.dataType))
    val want = output.map(a => (a.name, a.dataType))
    require(got == want,
      s"$name built a pipeline whose schema drifted from the TVF " +
        s"contract: got $got, declared $want")
    // nullability is declared tight (non-null where the pipeline
    // guarantees it, so SQL consumers keep null-filter pruning) —
    // refuse a build that stopped backing a non-null promise; the
    // other direction (declared nullable, built non-null) is a safe
    // over-approximation and allowed
    df.schema.zip(output).foreach { case (f, a) =>
      require(a.nullable || !f.nullable,
        s"$name declares ${a.name} non-null but the built pipeline " +
          "reports it nullable - tighten the pipeline or relax the " +
          "TVF contract")
    }
    df
  }

  override protected def doExecute(): RDD[InternalRow] =
    inner.queryExecution.toRdd

  override def simpleString(maxFields: Int): String =
    s"LazyTvfExec $name (builds and runs the pipeline at execution)"
}

/** Planner strategy pairing the two, injected by
  * [[graft.GraftExtensions]]. */
object LazyTvfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: LazyTvfPlan => LazyTvfExec(t.name, t.output, t.build) :: Nil
    case _ => Nil
  }
}
