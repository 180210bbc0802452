package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfMaintenance
import graft.sources.IvfBinarySource

/** The storage-partitioned maintenance pass: correct recentering AND a
  * plan with zero Exchange nodes at 1M rows — the proof that the
  * connector's KeyGroupedPartitioning is a used capability, not a
  * report. */
class IvfMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val N = 1000000
  private val LISTS = 256
  private val DIM = 8

  /** 1M constant vectors: id → [c,c,…,c] with c = id%5+1 (constant
    * vectors quantize exactly: min==max), list = id%256. Analytic means
    * make the recenter check exact at scale. */
  private lazy val indexPath: String = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("ivf_maint").toString
    val df = spark.range(N).select(
      col("id").as("vec_id"),
      array_repeat((col("id") % 5 + 1).cast("float"), DIM).as("embedding"),
      (col("id") % LISTS).cast("int").as("centroid_id"))
    IvfBinarySource.write(df, "vec_id", "embedding", p)
    p
  }

  test("recenterReport is exchange-free at 1M rows and analytically correct") {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SPJ path
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val report = IvfMaintenance.recenterReport(spark, indexPath)
      val plan = report.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"maintenance pass must not shuffle a list-partitioned index:\n$plan")
      val rows = report.collect()
      assert(rows.length == LISTS)
      rows.foreach { r =>
        val cid = r.getInt(0)
        val centroid = r.getSeq[Float](1)
        val n = r.getLong(2)
        // ids in this list: cid, cid+256, … — expected member count and
        // analytic mean of (id%5+1) over them, f64-exact for small ints
        val ids = cid.toLong until N.toLong by LISTS.toLong
        assert(n == ids.size)
        val expectMean = (ids.map(id => (id % 5 + 1).toDouble).sum / ids.size).toFloat
        assert(centroid.length == DIM)
        centroid.foreach(c => assert(math.abs(c - expectMean) < 1e-4f,
          s"list $cid centroid $c != $expectMean"))
        // constant positive vectors are colinear with their mean → no drift
        assert(math.abs(r.getDouble(3)) < 1e-9, s"list $cid drift_avg")
        assert(math.abs(r.getDouble(4)) < 1e-9, s"list $cid drift_max")
      }
      // drift gate: nothing drifts in a colinear corpus
      assert(IvfMaintenance.driftedLists(report, 1e-6).count() == 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("indexDiff joins two indexes storage-partitioned: zero Exchange") {
    val n = 100000
    val lists = 64
    import spark.implicits._
    def base = spark.range(n).select(
      col("id").as("vec_id"),
      array_repeat((col("id") % 5 + 1).cast("float"), DIM).as("embedding"),
      (col("id") % lists).cast("int").as("centroid_id"))
    val pa = java.nio.file.Files.createTempDirectory("ivf_diff_a").toString
    val pb = java.nio.file.Files.createTempDirectory("ivf_diff_b").toString
    IvfBinarySource.write(base, "vec_id", "embedding", pa)
    // replica B: drops every 97th row, gains 500 new trailing rows
    val extras = spark.range(n, n + 500).select(
      col("id").as("vec_id"),
      array_repeat(lit(1f), DIM).as("embedding"),
      (col("id") % lists).cast("int").as("centroid_id"))
    IvfBinarySource.write(
      base.filter(col("vec_id") % 97 =!= 0).unionByName(extras),
      "vec_id", "embedding", pb)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // join keys (centroid_id, vec_id) are a SUPERSET of the partition
      // key; co-partitioning on the partition-key prefix needs this off
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val diff = IvfMaintenance.indexDiff(spark, pa, pb)
      val plan = diff.queryExecution.executedPlan.toString
      // the corpus-sized frames never shuffle: the single Exchange sits
      // ABOVE the join and carries per-list partial counters only
      val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges == 1 && plan.indexOf("Exchange") < plan.indexOf("Join") &&
        plan.indexOf("partial_sum") > plan.indexOf("Exchange"),
        s"two-index audit must not shuffle either index:\n$plan")
      val rows = diff.collect().map(r =>
        r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(rows.size == lists)
      (0 until lists).foreach { cid =>
        val ids = cid.toLong until n.toLong by lists.toLong
        val dropped = ids.count(_ % 97 == 0).toLong
        val gained = (n.toLong until n + 500L).count(_ % lists == cid).toLong
        assert(rows(cid) == ((dropped, gained, ids.size - dropped)),
          s"list $cid diff ${rows(cid)}")
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("digest-driven incremental audit reads only the churned lists") {
    val n = 10000
    val lists = 16
    import spark.implicits._
    def base = spark.range(n).select(
      col("id").as("vec_id"),
      array_repeat((col("id") % 5 + 1).cast("float"), DIM).as("embedding"),
      (col("id") % lists).cast("int").as("centroid_id"))
    val pa = java.nio.file.Files.createTempDirectory("ivf_dig_a").toString
    val pb = java.nio.file.Files.createTempDirectory("ivf_dig_b").toString
    IvfBinarySource.write(base, "vec_id", "embedding", pa)
    // replica churn confined to lists 3 and 7
    IvfBinarySource.write(
      base.filter(!(col("vec_id") % lists === 3 && col("vec_id") % 97 === 3))
        .unionByName(spark.range(n, n + 5).select(
          col("id").as("vec_id"),
          array_repeat(lit(1f), DIM).as("embedding"),
          lit(7).cast("int").as("centroid_id"))),
      "vec_id", "embedding", pb)
    val remembered = IvfMaintenance.listDigest(spark, pa)
    val flagged = IvfMaintenance.changedLists(
      IvfMaintenance.listDigest(spark, pb), remembered)
      .as[Int].collect().sorted
    assert(flagged.toSeq == Seq(3, 7), s"flagged ${flagged.toSeq}")
    val targeted = IvfMaintenance.indexDiff(spark, pa, pb, Some(flagged.toSeq))
    // connector-level pruning: the scans plan only the flagged lists
    val scans = targeted.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("GraftIvfScan")).toSeq
    assert(scans.size == 2 && scans.forall(_.contains("lists=[3,7]")),
      s"targeted audit must prune to the flagged lists:\n${scans.mkString("\n")}")
    val rows = targeted.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ids3 = (3L until n.toLong by lists.toLong)
    val dropped3 = ids3.count(_ % 97 == 3).toLong
    assert(rows.keySet == Set(3, 7))
    assert(rows(3) == ((dropped3, 0L, ids3.size - dropped3)))
    assert(rows(7) == ((0L, 5L, (7L until n.toLong by lists.toLong).size.toLong)))
  }

  test("shard rollup is mergeable and drills down to the churned lists") {
    val n = 8192
    val lists = 64 // shardBits=3 → 8 shards of 8 lists
    import spark.implicits._
    def base = spark.range(n).select(
      col("id").as("vec_id"),
      array_repeat((col("id") % 5 + 1).cast("float"), DIM).as("embedding"),
      (col("id") % lists).cast("int").as("centroid_id"))
    val pa = java.nio.file.Files.createTempDirectory("ivf_shard_a").toString
    val pb = java.nio.file.Files.createTempDirectory("ivf_shard_b").toString
    IvfBinarySource.write(base, "vec_id", "embedding", pa)
    // churn one list in shard 2 (list 21) and one in shard 5 (list 44)
    IvfBinarySource.write(
      base.filter(!(col("vec_id") % lists === 21 && col("vec_id") < 1000) &&
        !(col("vec_id") % lists === 44 && col("vec_id") < 500)),
      "vec_id", "embedding", pb)
    val (da, db) = (IvfMaintenance.listDigest(spark, pa),
      IvfMaintenance.listDigest(spark, pb))
    // mergeability: rolling the list digest up equals digesting shards
    // directly off the rows
    val rolled = IvfMaintenance.shardDigest(da, shardBits = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val direct = spark.read.format(IvfBinarySource.FORMAT).load(pa)
      .groupBy(shiftright(col("centroid_id"), 3).cast("int").as("shard"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(vec_id)").as("x"),
        sum("vec_id").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rolled.toSeq == direct.toSeq)
    // level 1: exactly the two churned shards flag
    val shards = IvfMaintenance.changedShards(
      IvfMaintenance.shardDigest(db, 3), IvfMaintenance.shardDigest(da, 3))
      .as[Int].collect().sorted
    assert(shards.toSeq == Seq(2, 5), s"shards ${shards.toSeq}")
    // level 2: within those shards' lists, exactly the churned lists flag
    val inShards = (c: org.apache.spark.sql.DataFrame) =>
      c.filter(shiftright(col("centroid_id"), 3).isin(shards.toSeq: _*))
    val flagged = IvfMaintenance.changedLists(inShards(db), inShards(da))
      .as[Int].collect().sorted
    assert(flagged.toSeq == Seq(21, 44), s"lists ${flagged.toSeq}")
  }

  test("drifted lists surface when a list's members point apart") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    // list 0: two orthogonal vectors (drift); list 1: colinear (tight)
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f, 0f), 0),
      (2L, Array(2f, 2f, 0f, 0f), 1),
      (3L, Array(4f, 4f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "centroid_id")
    IvfBinarySource.write(rows, "vec_id", "embedding", p)
    val report = IvfMaintenance.recenterReport(spark, p)
    val drifted = IvfMaintenance.driftedLists(report, 0.01)
      .collect().map(_.getInt(0)).toSeq
    assert(drifted == Seq(0))
  }
}
