package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed connected-components probe: the label-propagation +
  * pointer-jumping path ([[graft.operators.DedupOps]]) that takes over
  * when the edge set exceeds [[graft.operators.DedupOps.DriverEdgeLimit]]
  * — never scale-measured before (every prior probe's pair graph fit
  * the driver union-find).
  *
  * The synthesized graph stresses each convergence claim separately:
  *   - one MEGA-STAR (hub 0, `starSize` members) — the shape the star
  *     pair generator emits for a template cluster: depth ≤ 2, must
  *     resolve regardless of size;
  *   - one long CHAIN (`chainLen` nodes) — the worst DIAMETER case,
  *     where naive min-label propagation needs O(diameter) rounds and
  *     the pointer jumping must cut it to O(log diameter);
  *   - `pairCount` disjoint 2-node edges — component-count volume.
  *
  * Together they exceed DriverEdgeLimit, forcing the distributed path;
  * every component is asserted exactly (sizes, labels, counts), so a
  * convergence failure (maxIter hit with labels still moving) cannot
  * pass silently — a non-converged chain yields >1 label.
  *
  * Usage: runMain graft.CompScaleProbe [starSize] [chainLen] [pairCount]
  */
object CompScaleProbe {

  def main(args: Array[String]): Unit = {
    val starSize = if (args.length > 0) args(0).toLong else 5000000L
    val chainLen = if (args.length > 1) args(1).toLong else 100000L
    val pairCount = if (args.length > 2) args(2).toLong else 5000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val chainBase = 1000000000L
    val pairBase = 2000000000L
    // fail in milliseconds on id-band overlap, not after the
    // multi-minute pipeline with a misleading component-count error
    require(starSize >= 1 && starSize < chainBase &&
      chainLen >= 2 && chainBase + chainLen <= pairBase &&
      pairCount >= 1,
      s"id bands overlap or degenerate: star=$starSize chain=$chainLen " +
        s"pairs=$pairCount (need star < $chainBase, chain >= 2, " +
        s"chain end <= $pairBase)")
    // parquet-backed so the probe times the honest cold shape (the
    // verdict path hands the component search a shuffled frame, not a
    // cached range)
    val dir = java.nio.file.Files.createTempDirectory("comp_probe").toString
    val star = spark.range(1, starSize + 1)
      .select(lit(0L).as("doc_a"), col("id").as("doc_b"))
    val chain = spark.range(chainLen - 1)
      .select((col("id") + chainBase).as("doc_a"),
        (col("id") + chainBase + 1).as("doc_b"))
    val pairs = spark.range(pairCount)
      .select((col("id") * 2 + pairBase).as("doc_a"),
        (col("id") * 2 + pairBase + 1).as("doc_b"))
    star.union(chain).union(pairs)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/edges.parquet")
    val edges = spark.read.parquet(s"$dir/edges.parquet")
    val nPairs = starSize + (chainLen - 1) + pairCount
    require(nPairs > graft.operators.DedupOps.DriverEdgeLimit / 2,
      s"graph too small to force the distributed path: $nPairs pairs")

    val t0 = System.nanoTime()
    val (labels, nNodes) = graft.operators.DedupOps
      .connectedComponentsCounted(edges, "doc_a", "doc_b")
    // clock stops here: the component search (including its own pins
    // and the label count) is what the library path pays; the extra
    // pin below only stabilizes the probe's multi-assertion reads
    val sec = (System.nanoTime() - t0) / 1e9
    val pinned = labels.localCheckpoint(true)
    System.err.println(f"[probe] components        $sec%8.1f s  nodes=$nNodes")

    // ---- exact component structure ----
    val expectNodes = (starSize + 1) + chainLen + 2 * pairCount
    require(nNodes == expectNodes, s"node count $nNodes != $expectNodes")
    val starComp = pinned.filter(col("node") === 0L)
      .select("comp").head().getLong(0)
    require(starComp == 0L, s"star hub labeled $starComp")
    val starMembers = pinned.filter(col("comp") === 0L).count()
    require(starMembers == starSize + 1,
      s"mega-star component has $starMembers of ${starSize + 1} members")
    // the chain collapses to ONE component labeled by its min node —
    // this is the assertion a maxIter-truncated propagation fails
    val chainLabels = pinned
      .filter(col("node") >= chainBase && col("node") < chainBase + chainLen)
      .select("comp").distinct().collect().map(_.getLong(0))
    require(chainLabels.toSeq == Seq(chainBase),
      s"chain (diameter ${chainLen - 1}) did not converge to one label: " +
        s"${chainLabels.length} labels")
    val nComps = pinned.select("comp").distinct().count()
    require(nComps == 2 + pairCount,
      s"component count $nComps != ${2 + pairCount}")

    println(
      s"""{"metric":"comp_scale_probe","star":$starSize,""" +
        s""""chain":$chainLen,"pairs":$pairCount,""" +
        s""""edge_pairs":$nPairs,"nodes":$nNodes,""" +
        s""""components":$nComps,"wall_sec":${f"$sec%.1f"}}""")
    spark.stop()
  }
}
