package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q124's one-scan-per-input contract: the fused verdict reads
  * `documents.text` exactly TWICE — once for the shared shingle base
  * (BOTH pair families derive from it) and once for the (fp, quality)
  * doc-scalar frame — and its final plan touches no parquet at all
  * (every input rides a checkpoint). Counted with a SQL-execution
  * listener over the checkpoint materializations, the same evidence the
  * SQL UI shows. */
class DedupShareSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("q124 scans documents text exactly twice across its whole lineage") {
    import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
    val textScans = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: SparkListenerSQLExecutionStart
              // executions that MATERIALIZE a text read (Tables.loadP's
              // `.rdd` posts a plan-only execution that never runs —
              // the final-plan assertion below covers non-checkpoint
              // reads, so counting checkpoint actions is exhaustive)
              if s.description.startsWith("localCheckpoint") &&
                s.physicalPlanDescription.contains("documents.parquet") &&
                s.physicalPlanDescription.contains("text:string") =>
            textScans.incrementAndGet()
            seen.add(s.description + "\n" + s.physicalPlanDescription.take(600))
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = DedupQueries.q124DedupVerdict(spark, SparkSuite.sf001)
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("Scan parquet"),
        s"final plan must read checkpoints only:\n${finalPlan.take(1500)}")
      df.collect()
      // listener events post asynchronously; the scan executions all
      // happened during construction (eager checkpoints), so a short
      // drain is enough
      val deadline = System.nanoTime() + 10_000_000_000L
      while (textScans.get < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(200) // catch any scan BEYOND the expected two
      assert(textScans.get == 2,
        s"expected exactly 2 text-scanning executions, saw ${textScans.get}:\n" +
          seen.toArray.mkString("\n---\n"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q124 over the shared base still matches the standalone family queries") {
    val verdict = DedupQueries.q124DedupVerdict(spark, SparkSuite.sf001)
      .localCheckpoint(true)
    // subsumed column == q121's verdict, cluster/rep columns == q117's
    val q121 = DedupQueries.q121Subsume(spark, SparkSuite.sf001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got121 = verdict.select("doc_id", "subsumed")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got121 == q121)
    val q117 = DedupQueries.q117BestRep(spark, SparkSuite.sf001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    val got117 = verdict.select("doc_id", "cluster_id", "rep_keep")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got117 == q117)
  }
}
