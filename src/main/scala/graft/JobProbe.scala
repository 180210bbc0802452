package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility: run one registry query and print every Spark JOB it
  * submits with wall-clock — job-count-bound queries (many tiny
  * actions) look completely different here than data-bound ones.
  * `runMain graft.JobProbe <sfDir> <query>` */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    val jobs = ArrayBuffer[(Int, Long, String)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(si =>
          si.name + " tasks=" + js.stageInfos.map(_.numTasks).sum).getOrElse("?")
        starts(js.jobId) = (js.time, site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          jobs += ((je.jobId, je.time - t0, d.take(90)))
        }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // drain listener bus
    println(f"[jobprobe] $name total=$total%.3f s, ${jobs.size} jobs")
    jobs.foreach { case (id, ms, d) =>
      println(f"[jobprobe]   job=$id%-3d ${ms}%5d ms  $d")
    }
    println(f"[jobprobe] sum=${jobs.map(_._2).sum} ms (gaps = planning/driver)")
    spark.stop()
  }
}
