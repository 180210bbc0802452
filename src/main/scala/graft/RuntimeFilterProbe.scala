package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.IvfBinarySource

/** Runtime-V2-filtering probe: wall-clocks a selective join against the
  * binary index WITH and WITHOUT dynamic pruning at N rows / 256 lists.
  * The join's build side selects 2 hot lists; with pruning the scan
  * plans 2 `list=` dirs, without it the full index streams through the
  * join. The gap is the DPP payoff, and it widens linearly with index
  * size — at 100 TB it is the difference between a lookup and a scan.
  *
  * Usage: runMain graft.RuntimeFilterProbe [nRows]
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val lists = 256
    val p = java.nio.file.Files.createTempDirectory("rtf_probe").toString
    IvfBinarySource.write(
      spark.range(n).select(
        col("id").as("vec_id"),
        array_repeat((col("id") % 7 + 1).cast("float"), 64).as("embedding"),
        (col("id") % lists).cast("int").as("centroid_id")),
      "vec_id", "embedding", p)
    val dimP = java.nio.file.Files.createTempDirectory("rtf_dim").toString
    (0 until lists).map(i => (i, if (i == 11 || i == 42) "hot" else "cold"))
      .toDF("centroid_id", "tag").write.mode("overwrite").parquet(dimP)

    def run(): (Double, Long) = {
      val joined = spark.read.format(IvfBinarySource.FORMAT).load(p)
        .select("vec_id", "qvec", "centroid_id")
        .join(spark.read.parquet(dimP).filter(col("tag") === "hot"), "centroid_id")
      val t0 = System.nanoTime()
      // aggregate over the vector bytes: count() would column-prune to a
      // metadata-only scan and read no rows at all, hiding the gap
      val c = joined.agg(count(col("qvec")).as("n"),
        sum(crc32(col("qvec"))).as("_h")).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, c)
    }
    // warm FS caches with an untimed pass, then measure both modes
    run()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val (offSec, offCnt) = run()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    val (onSec, onCnt) = run()
    val expect = 2L * (n / lists)
    assert(onCnt == expect && offCnt == expect, s"$onCnt/$offCnt != $expect")
    println(f"[rtf-probe] n=$n lists=$lists hot=2 " +
      f"dpp_on=$onSec%.2fs dpp_off=$offSec%.2fs speedup=${offSec / onSec}%.1fx")
    spark.stop()
  }
}
