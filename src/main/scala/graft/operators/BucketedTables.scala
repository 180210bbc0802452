package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via Spark bucketing (`bucketBy` + `saveAsTable`).
  *
  * [[graft.sources.ParquetStore]] buckets into partition DIRECTORIES for
  * mutation locality (partition pruning on writes); THIS is the
  * complementary read-side layout: hash-bucketed table files whose
  * `outputPartitioning` the planner recognizes, so equi-joins and
  * aggregations on the bucket key run with NO shuffle exchange at all.
  * At 100 TB, bucketing both fact tables on the join key once at write
  * time removes the dominant repeated shuffle from every downstream join.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge joins need no sort either). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 16): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-key bucketed tables — planner sees compatible
    * bucketing on both sides and elides both exchanges. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
