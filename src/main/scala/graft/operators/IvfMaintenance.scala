package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.sources.IvfBinarySource

/** Exchange-free maintenance passes over the on-disk binary IVF index.
  *
  * The connector reports `KeyGroupedPartitioning(centroid_id)` — every
  * input split holds exactly one list — so with
  * `spark.sql.sources.v2.bucketing.enabled` the per-list aggregations
  * AND the row⋈stats join below are storage-partitioned: Spark plans
  * them with ZERO Exchange nodes, each task streams only its own list's
  * files. At 100 TB this is the difference between a maintenance pass
  * that shuffles the corpus twice and one that never shuffles at all —
  * the reference gets the same property for free by iterating one
  * list's spill file at a time (dnc/dnc.go:402-456 recenter loop).
  */
object IvfMaintenance {

  /** Per-list recenter + drift report (the reference's M7 recenter,
    * dnc.go:402-456, plus the "should this list split/merge?" signal its
    * operator reads off list sizes): for every list, the refreshed
    * centroid (member mean, f64 sums), member count, and how far members
    * sit from the refreshed center (cosine drift, 0 = perfectly tight).
    *
    * Plan shape (with v2 bucketing on): scan → partial-free grouped agg
    * (stats) → storage-partitioned join back to the member rows → second
    * list-local agg. No Exchange anywhere; scan cost = index size, twice
    * (the stats and member branches — deliberately NOT checkpointed,
    * which would erase the partitioning report and force a shuffle). */
  def recenterReport(spark: SparkSession, path: String): DataFrame = {
    def members = spark.read.format(IvfBinarySource.FORMAT).load(path)
      .select(col("centroid_id"), gf.dequantize_vec(col("qvec")).as("v"))
    val stats = members.groupBy("centroid_id")
      .agg(gf.vector_mean(col("v")).as("centroid"), count(lit(1)).as("n"))
    members.join(stats, Seq("centroid_id"))
      .select(col("centroid_id"), col("centroid"), col("n"),
        (lit(1.0) - gf.cosine_sim(col("v"), col("centroid"))).as("d"))
      .groupBy(col("centroid_id"))
      .agg(first(col("centroid")).as("centroid"), first(col("n")).as("n"),
        avg(col("d")).as("drift_avg"), max(col("d")).as("drift_max"))
  }

  /** Lists whose refreshed center moved or spread past tolerance — the
    * input set for a targeted re-assign (only these lists' members get
    * re-scored, the rest of the index is untouched). */
  def driftedLists(report: DataFrame, maxDrift: Double): DataFrame =
    report.filter(col("drift_avg") > maxDrift).select("centroid_id", "n", "drift_avg")

  /** TWO-index divergence audit — the replica-consistency / delta-vs-main
    * maintenance shape: per list, how many rows live only in A, only in
    * B, and in both. The reference's single-node twin walks both spill
    * files for a list side by side; here the join key (centroid_id,
    * vec_id) CONTAINS the partition key, so with v2 bucketing the two
    * indexes' `KeyGroupedPartitioning(centroid_id)` reports satisfy the
    * join's distribution requirement directly (with
    * `requireAllClusterKeysForCoPartition=false` — the keys are a
    * superset of the partition key): Spark plans a storage-partitioned
    * full-outer join — each task cogroups one list's files from each
    * index, ZERO Exchange below the join (spec-pinned at 100k rows), and
    * column pruning keeps vector bytes on disk. The full-outer USING key
    * is a coalesce of both sides, so the per-list rollup can't prove
    * partitioning over it; the plan's ONLY Exchange moves map-side
    * partial counters — ≤ |lists|·|tasks| rows. At 100 TB the
    * alternative is shuffling both indexes end to end — this shape reads
    * each exactly once and moves only per-list counters. */
  def indexDiff(spark: SparkSession, pathA: String, pathB: String,
      only: Option[Seq[Int]] = None): DataFrame = {
    def side(p: String, tag: String) = {
      val df = spark.read.format(IvfBinarySource.FORMAT).load(p)
        .select(col("centroid_id"), col("vec_id"), lit(1).as(tag))
      // the In filter reaches the connector: non-listed list= dirs are
      // never planned, so a targeted audit reads only the flagged lists
      only.fold(df)(ls => df.filter(col("centroid_id").isin(ls: _*)))
    }
    side(pathA, "_a")
      .join(side(pathB, "_b"), Seq("centroid_id", "vec_id"), "full_outer")
      .groupBy("centroid_id")
      .agg(
        sum(when(col("_a").isNotNull && col("_b").isNull, 1L).otherwise(0L))
          .as("only_a"),
        sum(when(col("_b").isNotNull && col("_a").isNull, 1L).otherwise(0L))
          .as("only_b"),
        sum(when(col("_a").isNotNull && col("_b").isNotNull, 1L).otherwise(0L))
          .as("both"))
  }

  /** Per-list content digest — (centroid_id, n, id_xor, id_sum) from an
    * id-only scan (vector bytes stay on disk; with v2 bucketing the agg
    * is exchange-free). A digest is lists-sized: remember it, and the
    * next audit is INCREMENTAL — [[changedLists]] against the remembered
    * frame flags churn, then [[indexDiff]] with `only=flagged` reads just
    * those lists instead of both full indexes. The digest is a drift
    * DETECTOR, not proof of equality (equal digests can collide only on
    * an adversarially crafted id multiset): certainty comes from running
    * the full per-row diff on exactly the flagged lists. */
  def listDigest(spark: SparkSession, path: String): DataFrame =
    spark.read.format(IvfBinarySource.FORMAT).load(path)
      .select(col("centroid_id"), col("vec_id"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(vec_id)").as("id_xor"),
        sum("vec_id").as("id_sum"))

  /** Lists whose digest differs between the current index and a
    * remembered [[listDigest]] frame — including lists that appeared or
    * vanished. Both inputs are lists-sized; the comparison is trivial. */
  def changedLists(current: DataFrame, remembered: DataFrame): DataFrame =
    changedKeys(current, remembered, "centroid_id")

  /** Roll a [[listDigest]] up one level: shard = centroid_id >> shardBits.
    * count and id_sum add, id_xor folds — so the rollup is EXACTLY the
    * digest computed at shard granularity (mergeability, spec-pinned),
    * the same property that lets the leaf digest combine map-side. A
    * fleet-scale replica audit then ships |shards| rows per replica,
    * drills into the changed shards' list digests, and reads only the
    * changed lists: three levels, each message churn-bounded. */
  def shardDigest(digest: DataFrame, shardBits: Int = 6): DataFrame =
    digest
      .groupBy(shiftright(col("centroid_id"), shardBits).cast("int").as("shard"))
      .agg(sum("n").as("n"), expr("bit_xor(id_xor)").as("id_xor"),
        sum("id_sum").as("id_sum"))

  /** Shards whose rollup differs — the drill-down set for [[changedLists]]
    * restricted to those shards' lists. */
  def changedShards(current: DataFrame, remembered: DataFrame): DataFrame =
    changedKeys(current, remembered, "shard")

  private def changedKeys(current: DataFrame, remembered: DataFrame,
      keyCol: String): DataFrame = {
    val cur = current.select(col(keyCol), struct("n", "id_xor", "id_sum").as("_c"))
    val old = remembered.select(col(keyCol), struct("n", "id_xor", "id_sum").as("_o"))
    cur.join(old, Seq(keyCol), "full_outer")
      .filter(col("_c").isNull || col("_o").isNull || col("_c") =!= col("_o"))
      .select(keyCol)
  }
}
