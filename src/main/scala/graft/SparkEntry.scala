package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * brute-force cosine top-k over the embeddings table (SURVEY §7 Phase 0). */
  def entry(spark: SparkSession): DataFrame =
    Queries.q16CosineTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (Queries),
    * plus the scale-pipeline extensions (DedupQueries, PipelineQueries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry ++ DedupQueries.registry ++ PipelineQueries.registry ++
      RetrievalQueries.registry ++ CurationQueries.registry ++
      AnalyticsQueries.registry ++ OwnershipQueries.registry ++
      SelectionQueries.registry ++ AuditQueries.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracle ++ DedupQueries.oracle ++ PipelineQueries.oracle ++
      RetrievalQueries.oracle ++ CurationQueries.oracle ++
      AnalyticsQueries.oracle ++ OwnershipQueries.oracle ++
      SelectionQueries.oracle ++ AuditQueries.oracle
}
