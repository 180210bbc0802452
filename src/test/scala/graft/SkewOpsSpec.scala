package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps
import graft.index.IvfIndex

/** Skew helpers equal their unsalted twins; MLlib build path works. */
class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def events = Tables.load(spark, SparkSuite.sf0001, "events")

  test("saltedAgg equals plain groupBy aggregation") {
    val plain = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewOps.saltedAgg(events, Seq(col("user_id")), 16)(
        partials = Seq(count(lit(1)).as("n"), sum(col("value")).as("s")),
        merges = Seq(sum(col("n")).as("n"), round(sum(col("s")), 2).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val users = events.select("user_id").distinct()
      .withColumn("tag", concat(lit("u"), col("user_id")))
    val plain = events.join(users, Seq("user_id"))
      .select("event_id", "tag")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(events, users, "user_id", 8)
      .select("event_id", "tag")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("MLlib cosine-kmeans build produces a searchable index equal to brute force at nprobe=all") {
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings")
    val (indexed, model) = IvfIndex.buildMllib(e, "embedding",
      IvfIndex.Params(listSize = 100, maxIter = 5))
    assert(model.k >= 2)
    assert(indexed.groupBy("centroid_id").count().collect().map(_.getLong(1)).sum == 500L)
    val query = e.filter(col("vec_id") === 7).select("embedding").head().getSeq[Float](0).toArray
    val ivf = IvfIndex.search(indexed, model, "vec_id", "embedding", query, 10, -1)
      .collect().map(_.getLong(0)).toSeq
    val brute = e.select(col("vec_id"),
        graft.functions.gf.cosine_sim(col("embedding"), lit(query).cast("array<float>")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
  }
}
