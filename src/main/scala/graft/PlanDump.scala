package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named registry queries into
  * plans/<tag>/<qkey>_<suffix>.txt — the optimization round's
  * before/after plan evidence (uses only the public registry, so it
  * compiles against any revision).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <qkey>... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val keys = args.drop(3)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { key =>
      // seam keys dump a pinned pipeline's PRE-PIN subplan — the plan a
      // final-plan dump hides behind `Scan ExistingRDD` (r19, the
      // optimization rounds' evidence surface; everything else uses the
      // public registry)
      val df = key match {
        case "seamcapped" => DedupQueries.cappedShinglesOf(
          Tables.loadP(spark, dir, "documents"),
          Tables.byteSize(spark, dir, "documents").map(b => math.max(1L, b / 2)))
        case _ => SparkEntry.queries(key)(spark, dir)
      }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        outDir.resolve(s"${key.takeWhile(_ != '_')}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $key -> ${key.takeWhile(_ != '_')}_$suffix.txt")
    }
    spark.stop()
  }
}
