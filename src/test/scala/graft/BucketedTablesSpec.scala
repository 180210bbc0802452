package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BucketedTables

/** Co-located bucketed joins: correct results with ZERO shuffle. */
class BucketedTablesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("same-key bucketed join runs without any shuffle exchange") {
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "lang", "source")
    val emb = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    BucketedTables.writeBucketed(docs, "b_docs", "doc_id", 8)
    BucketedTables.writeBucketed(emb, "b_emb", "doc_id", 8)
    try {
      val joined = BucketedTables.bucketedJoin(spark, "b_docs", "b_emb", "doc_id")
      // results match the plain join
      val expect = docs.join(emb, "doc_id").count()
      assert(joined.count() == expect)
      // and the (non-broadcast) physical plan has no shuffle Exchange:
      // disable auto-broadcast so the planner must consider distribution,
      // then bucketing satisfies it without exchanges
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try BucketedTables.bucketedJoin(spark, "b_docs", "b_emb", "doc_id")
          .queryExecution.executedPlan.toString
        finally {
          spark.conf.set("spark.sql.adaptive.enabled", "true")
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_emb")
    }
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "n_chars")
    BucketedTables.writeBucketed(docs, "b_docs_agg", "doc_id", 8)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table("b_docs_agg").groupBy("doc_id")
        .agg(sum("n_chars").as("s"))
      val plan =
        try agg.queryExecution.executedPlan.toString
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(!plan.contains("Exchange"), plan)
      assert(agg.count() == docs.count())
    } finally spark.sql("DROP TABLE IF EXISTS b_docs_agg")
  }
}
