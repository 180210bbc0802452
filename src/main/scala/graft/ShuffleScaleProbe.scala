package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Epoch-shuffle-at-scale probe: synthesizes an N-document corpus on
  * disk (ids only matter — q79 prunes every other column) and
  * wall-clocks the shipped q79 permutation cold, then PROVES the output
  * is a permutation with balanced shards: exactly one position per doc,
  * positions covering 1..N, and round-robin shard sizes differing by at
  * most one. The interesting scale question is RankOps' correctness pin
  * (a full materialization of the ranked projection) plus the range
  * exchange — this measures both together at 10M rows, where a
  * single-partition window would already be unrunnable.
  *
  * Usage: runMain graft.ShuffleScaleProbe [nDocs]
  */
object ShuffleScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("shuffle_probe").toString
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr("concat('t', id)").as("text"),
        lit("en").as("lang"), lit("s0").as("source"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val out = CurationQueries.q79EpochShuffle(spark, dir)
    val rows = out.count()
    val shuffleSec = (System.nanoTime() - t0) / 1e9

    // permutation proof (outside the timing): every position 1..N hit
    // exactly once, shards round-robin balanced
    val t1 = System.nanoTime()
    val stats = out.agg(
      min("pos").as("min_pos"), max("pos").as("max_pos"),
      count_distinct(col("pos")).as("n_pos")).head()
    val shardSizes = out.groupBy("shard").count()
      .agg(min("count").as("lo"), max("count").as("hi"),
        count(lit(1)).as("n_shards")).head()
    val checkSec = (System.nanoTime() - t1) / 1e9
    require(rows == n && stats.getLong(0) == 1L && stats.getLong(1) == n &&
      stats.getLong(2) == n, s"not a permutation: $stats over $rows rows")
    require(shardSizes.getLong(2) == 8 &&
      shardSizes.getLong(1) - shardSizes.getLong(0) <= 1,
      s"shards unbalanced: $shardSizes")

    println(s"""{"probe":"epoch_shuffle_scale","n_docs":$n,""" +
      s""""shuffle_sec":$shuffleSec,"check_sec":$checkSec,""" +
      s""""shards":${shardSizes.getLong(2)},"shard_lo":${shardSizes.getLong(0)},""" +
      s""""shard_hi":${shardSizes.getLong(1)}}""")
    spark.stop()
  }
}
