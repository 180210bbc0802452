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

  // --- pathological-skew stress: one key owns half the rows ---------------

  /** 60k rows: key 0 owns 50%, keys 1..999 share the rest uniformly. */
  private def skewed = {
    import spark.implicits._
    spark.range(60000).select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(999)) + 1)
        .as("k"),
      (col("id") % 97).cast("double").as("v"),
      col("id").as("rid"))
  }

  test("stress: saltedAgg on a 50%-hot key is correct and spreads the hot key") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewOps.saltedAgg(skewed, Seq(col("k")), 16)(
        partials = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
        merges = Seq(sum(col("n")).as("n"), sum(col("s")).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
    // the hot key's 30k rows must actually split across the salt space:
    // every salt bucket stays an order of magnitude below the unsalted group
    val subGroups = skewed
      .withColumn("_salt", pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(16)))
      .filter(col("k") === 0).groupBy("_salt").count()
      .collect().map(_.getLong(1))
    assert(subGroups.length == 16, "hot key should hit all 16 salt buckets")
    assert(subGroups.max < 30000 / 4, s"salt spread too uneven: ${subGroups.toSeq}")
  }

  test("stress: saltedJoin against the 50%-hot key equals the plain join") {
    val dim = skewed.select("k").distinct().withColumn("tag", concat(lit("t"), col("k")))
    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum(crc32(col("tag"))))
      .collect().head.toSeq
    val salted = SkewOps.saltedJoin(skewed, dim, "k", 8)
      .agg(count(lit(1)), sum(crc32(col("tag")))).collect().head.toSeq
    assert(salted == plain)
  }

  test("stress: AQE skew-join splits the hot partition at runtime") {
    // moderate skew is AQE's job (SkewOps is for single-key pathology);
    // prove the runtime re-plan actually fires on our data shapes
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val right = skewed.select(col("k"), col("v").as("w"), col("rid").as("rrid"))
      // aggregate ON TOP of the join so the action finalizes the same
      // AdaptiveSparkPlan that contains the join (a separate .count()
      // would build its own QueryExecution and never finalize this one).
      // Sum the unique rid payloads so column pruning can't strip the
      // partitions down to the constant hot key, which compresses to
      // almost nothing and ducks under the skew threshold.
      val agg = skewed.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum("rid").as("sl"), sum("rrid").as("sr"))
      val n = agg.collect().head.getLong(0)
      assert(n > 60000L) // hot key fans out
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join did not fire:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
