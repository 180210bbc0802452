package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup RESOLUTION: candidate pairs → duplicate clusters → keep set.
  *
  * Pair generation (MinHash/SimHash/embedding blocking — DedupQueries)
  * finds edges; this turns them into a decision. Components are computed
  * by min-label propagation — a driver loop of joins, each a bounded
  * shuffle on node ids, converging in O(cluster diameter) rounds.
  * Near-dup clusters are shallow (stars/chains of a few docs), so rounds
  * stay single-digit even at corpus scale; every round materializes via
  * localCheckpoint so lineage doesn't stack.
  */
object DedupOps {

  /** Connected components of an undirected pair list. Returns
    * (node, comp) where comp = the minimum node id reachable. */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .union(pairs.select(col(b).cast("long").as("src"), col(a).cast("long").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src").as("nnode")).agg(min("comp").as("ncomp"))
      val propagated = labels.join(neighborMin, labels("node") === col("nnode"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jumping: follow comp -> comp's comp, halving chain depth
      // each round (O(log diameter) convergence instead of O(diameter))
      val jump = propagated.select(col("node").as("jn"), col("comp").as("jc"))
      val updated = propagated.as("x")
        .join(jump, col("x.comp") === col("jn"), "left")
        .select(col("x.node").as("node"),
          least(col("x.comp"), coalesce(col("jc"), col("x.comp"))).as("comp"))
        .localCheckpoint(true)
      val changed = updated.as("u")
        .join(labels.as("l"), col("u.node") === col("l.node"))
        .filter(col("u.comp") =!= col("l.comp")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
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
