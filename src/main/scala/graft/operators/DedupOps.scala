package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Pins.Pinned

/** Near-dup RESOLUTION: candidate pairs → duplicate clusters → keep set.
  *
  * Pair generation (MinHash/SimHash/embedding blocking — DedupQueries)
  * finds edges; this turns them into a decision. Components are computed
  * adaptively:
  *
  *  - edge sets up to [[DriverEdgeLimit]] are collected and solved with
  *    path-compressed union-find on the driver — one job instead of
  *    ~3 shuffles × rounds. The near-dup graph is a small fraction of the
  *    corpus (it holds ids, not documents), so this is the common case;
  *  - larger graphs run min-label propagation + pointer jumping — a
  *    driver loop of bounded shuffles on node ids converging in
  *    O(log diameter) rounds, each round materialized via localCheckpoint
  *    so lineage doesn't stack. Real crawls contain MEGA-clusters
  *    (10⁵-10⁶-member template boilerplate) alongside small
  *    stars/chains, but the engine's scale-path pair generators emit
  *    them as depth-≤2 star graphs ([[graft.DedupQueries]]'s
  *    star-pairing mode — every bucket member edges to the bucket min),
  *    so label propagation still converges in a constant handful of
  *    rounds; diameter grows only through chains of OVERLAPPING
  *    buckets, logarithmically tamed by the pointer jumping.
  */
object DedupOps {

  /** Above this many undirected edges the component search stays
    * distributed. 10M edges ≈ 160 MB collected — safe on any driver that
    * runs Spark itself; the label result broadcast back is ≤ |nodes|. */
  val DriverEdgeLimit: Long = 10_000_000L

  /** Above this many rows an exception-set frame stops being broadcast
    * (see [[gateBroadcast]]). 4M id-keyed verdict rows ≈ 100-200 MB
    * built into a broadcast hash relation — inside every executor's
    * budget and far under the 8 GB broadcast hard cap; beyond it the
    * "exception set ≪ corpus" assumption the broadcast encodes has
    * failed and a shuffle join is the only shape that survives. */
  val BroadcastRowLimit: Long = 4_000_000L

  /** Size-gate an exception-set frame for joining against a corpus
    * spine. The dedup verdict queries (q117/q121/q124) left-join small
    * id-keyed verdict tables — cluster members, subsumption victims —
    * onto a corpus scan, and on typical corpora those tables are tiny,
    * so a broadcast join keeps the corpus unshuffled. But on dup-HEAVY
    * corpora (real crawls run 30-60% duplicate) the "exception set"
    * approaches corpus scale and an unconditional `broadcast()` hint
    * (which bypasses autoBroadcastJoinThreshold) would OOM the driver.
    *
    * So: pin the frame (it is consumed by the join and often by a
    * sibling aggregate — one materialization, the same correctness
    * convention as RankOps), COUNT it (free once pinned), and return it
    * broadcast-hinted when small, merge-hinted when large. The merge
    * hint — not a bare frame — makes the fallback deterministic: a
    * sort-merge join with NO BroadcastExchange, regardless of what AQE
    * would guess from runtime stats. The same adaptive pattern as
    * [[connectedComponents]]'s driver/distributed gate. */
  def gateBroadcast(dim: DataFrame,
      rowLimit: Long = BroadcastRowLimit): DataFrame = {
    // "size-gated": the pin's every broadcast hint is applied under a
    // runtime count of this very frame (gateKnown below) — the tag the
    // structural broadcast net accepts as a per-side boundedness proof
    // (PlanRegressionSpec pinBoundAllowed)
    val pinned = dim.pin("size-gated")
    gateKnown(pinned, pinned.count(), rowLimit)
  }

  /** [[gateBroadcast]] when the caller already KNOWS the frame's row
    * count — or a safe upper bound (an over-estimate can only demote a
    * broadcast to sort-merge, never OOM one). No pin, no count job: the
    * producing aggregate's cardinality is reused instead of
    * re-materializing a frame that is often already checkpoint-backed
    * (the r7→r8 bench claw-back: q117/q121/q124 paid 2× in eager
    * re-pins for counts their producers knew). */
  def gateKnown(dim: DataFrame, knownCount: Long,
      rowLimit: Long = BroadcastRowLimit): DataFrame =
    if (knownCount <= rowLimit) broadcast(dim) else dim.hint("merge")

  /** Release the block-manager blocks behind an eagerly
    * localCheckpoint'ed frame once downstream materializations no
    * longer read them. Checkpoint blocks otherwise live until the
    * frame is GC'd and the ContextCleaner notices — at 10M-doc probe
    * scale, a staging frame (the exploded shingle table under
    * [[graft.DedupQueries]]'s df pass) left resident alongside its
    * derived checkpoint doubles storage and squeezes execution memory
    * into AGGREGATE_OUT_OF_MEMORY. No-op for non-checkpointed frames. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components of an undirected pair list. Returns
    * (node, comp) where comp = the minimum node id reachable. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
      maxIter: Int = 20, driverEdgeLimit: Long = DriverEdgeLimit): DataFrame =
    connectedComponentsCounted(pairs, a, b, maxIter, driverEdgeLimit)._1

  /** [[connectedComponents]] plus the label-table row count (= node
    * count), free on the driver path (the label map is driver-local)
    * and one cheap count over the final checkpoint on the distributed
    * path — callers size-gating the result ([[gateKnown]]) skip a
    * re-pin + re-count, and every per-cluster aggregate derived from
    * the labels is bounded by the same number. */
  def connectedComponentsCounted(pairs: DataFrame, a: String, b: String,
      maxIter: Int = 20,
      driverEdgeLimit: Long = DriverEdgeLimit): (DataFrame, Long) = {
    // r19: OPTIMISTIC single collect. The common case (pair graph ≪
    // corpus) previously paid three jobs — a pin running the pair
    // source through a union+distinct exchange of 2×|pairs| directed
    // rows, a count, a collect. Union-find needs neither direction
    // doubling nor dedup (it is idempotent and undirected), so the
    // driver path now collects the raw (a, b) pair list directly: ONE
    // job, and the shuffle that job runs carries half the rows. Two
    // guards keep the collect bounded:
    //  - the row gate stays EXACT: |pairs|·2 (what the old directed
    //    distinct counted — callers' pair lists are distinct and a < b
    //    by construction) against driverEdgeLimit, checked post-collect;
    //    past it the distributed path runs as before (the rare regime
    //    pays one extra pair-source pass — noise next to its label
    //    loop);
    //  - a COLLECT past spark.driver.maxResultSize is aborted by Spark
    //    itself (the driver never materializes it); that abort routes
    //    to the distributed path instead of failing the query.
    val und = pairs.select(col(a).cast("long").as("src"),
      col(b).cast("long").as("dst"))
    val sp = pairs.sparkSession
    import sp.implicits._
    val collected: Option[Array[(Long, Long)]] =
      try {
        val arr = und.as[(Long, Long)].collect()
        if (arr.length * 2L <= driverEdgeLimit) Some(arr) else None
      } catch {
        // "Total size of serialized results ... bigger than
        // spark.driver.maxResultSize" — the one failure this gate
        // expects; anything else re-throws untouched
        case e: org.apache.spark.SparkException
            if String.valueOf(e.getMessage).contains("maxResultSize") =>
          None
      }
    collected match {
      case Some(arr) => driverComponents(pairs.sparkSession, arr)
      case None =>
        val edges = und
          .union(pairs.select(col(b).cast("long").as("src"),
            col(a).cast("long").as("dst")))
          .distinct().pin()
        val labels = distributedComponents(edges, maxIter)
        (labels, labels.count())
    }
  }

  /** Small-graph path: union-find with path compression + union-by-min
    * over the collected pair list. One createDataFrame — no jobs; the
    * label count is free. Duplicate or reversed pairs are harmless
    * (union is idempotent and undirected). */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)]): (DataFrame, Long) = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach {
      case (s, d) =>
        parent.getOrElseUpdate(s, s)
        parent.getOrElseUpdate(d, d)
        val (rs, rd) = (find(s), find(d))
        if (rs != rd) { // union by min so the root IS the component label
          if (rs < rd) parent(rd) = rs else parent(rs) = rd
        }
    }
    val labels = parent.keys.toSeq.map(n => (n, find(n)))
    (spark.createDataFrame(labels).toDF("node", "comp"), labels.size.toLong)
  }

  /** Scale path: min-label propagation + pointer jumping. */
  private def distributedComponents(edges: DataFrame, maxIter: Int): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node")).pin()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("nnode")).agg(min("comp").as("ncomp"))
      // carry the previous label through the round so convergence is a
      // filter on the checkpointed result, not another join against the
      // old labels
      val propagated = labels.join(neighborMin, labels("node") === col("nnode"), "left")
        .select(col("node"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jumping: follow comp -> comp's comp, halving chain depth
      // each round (O(log diameter) convergence instead of O(diameter))
      val jump = propagated.select(col("node").as("jn"), col("comp").as("jc"))
      val updated = propagated.as("x")
        .join(jump, col("x.comp") === col("jn"), "left")
        .select(col("x.node").as("node"), col("x.prev").as("prev"),
          least(col("x.comp"), coalesce(col("jc"), col("x.comp"))).as("comp"))
        .pin()
      val changed = updated.filter(col("comp") =!= col("prev")).count()
      labels = updated.select(col("node"), col("comp"))
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** SemDeDup verdict pass (Abbas et al. 2023) over a pre-clustered
    * embedding frame: per cluster, compare members pairwise (the pair
    * space is Σ|cluster|², never n²), and inside each ε-neighborhood
    * keep the member farthest from its cluster centroid — the paper's
    * keep-low-centroid-similarity rule — via a SINGLE-PASS dominance
    * decision on (centroid_sim, id), no iterative components. Centroids
    * are |clusters| rows and ride a broadcast; the corpus shuffles once,
    * by cluster key, for the self-join. Similarities are rounded to 4dp
    * before thresholding/comparison so verdicts are reproducible across
    * engines (the q94 DuckDB oracle replicates them exactly).
    *
    * Emits every input id with (cluster, cent_sim, n_dups, kept). */
  def semDedup(e: DataFrame, idCol: String, clusterCol: String,
      vecCol: String, eps: Double): DataFrame = {
    import graft.functions.gf
    val cent = e.groupBy(clusterCol)
      .agg(gf.vector_mean(col(vecCol)).as("_centroid"))
    val scored = e.join(broadcast(cent), clusterCol)
      .select(col(idCol), col(clusterCol), col(vecCol),
        (round(gf.cosine_sim(col(vecCol), col("_centroid")), 4) + 0.0)
          .as("cent_sim"))
      // CORRECTNESS pin, not just a perf trade (RankOps convention): the
      // scored subtree is consumed three times (both self-join sides +
      // the verdict join-back). vector_mean merges float partials in
      // shuffle-arrival order, so three independent re-executions could
      // produce centroids differing in low bits and a cent_sim that
      // rounds differently per consumer — splitting one vector's verdict.
      // Pinning freezes cent_sim as data. MEMORY_AND_DISK, corpus-sized:
      // the one materialization this operator pays by design.
      .pin()
    val dom = scored.as("a")
      .join(scored.as("b"),
        col(s"a.$clusterCol") === col(s"b.$clusterCol") &&
          col(s"a.$idCol") =!= col(s"b.$idCol") &&
          round(gf.cosine_sim(col(s"a.$vecCol"), col(s"b.$vecCol")), 4) >= eps)
      .groupBy(col(s"a.$idCol").as(idCol))
      .agg(count(lit(1)).as("n_dups"),
        max(when(struct(col("b.cent_sim"), col(s"b.$idCol")) <
          struct(col("a.cent_sim"), col(s"a.$idCol")), 1).otherwise(0)).as("_dom"))
    scored.join(dom, Seq(idCol), "left")
      .select(col(idCol), col(clusterCol), col("cent_sim"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("_dom"), lit(0)) === 0).as("kept"))
  }

  /** Keep-set dedup: every doc not in a duplicate cluster survives; each
    * cluster keeps its minimum id. Anti-join shaped — the doc table never
    * shuffles whole, only ids do. */
  def dedupKeepCanonical(docs: DataFrame, idCol: String,
      pairs: DataFrame, a: String, b: String): DataFrame = {
    val comps = connectedComponents(pairs, a, b)
    val losers = comps.filter(col("node") =!= col("comp"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
