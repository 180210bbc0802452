package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Semantic-dedup-at-scale probe: wall-clocks the q94/SemDeDup verdict
  * pass ([[graft.operators.DedupOps.semDedup]]) over an N-vector corpus
  * with EXACTLY verifiable planted duplicates, cold from on-disk parquet.
  *
  * Corpus design (all analytic — no tolerance windows): clusters of 64
  * members; member j of a cluster carries basis vector e_b scaled by
  * (id%5+1), with b = j except every 10th member (j%10==9), which REUSES
  * its predecessor's basis — colinear, cosine exactly 1. Distinct-basis
  * members are orthogonal, cosine exactly 0. So with any ε in (0,1) the
  * ε-neighbor graph is precisely the 6 planted pairs per cluster, the
  * colinear pair's centroid similarities are bit-equal (the scale cancels
  * exactly in f64 — single-term dot), and the (cent_sim, id) dominance
  * tie-break must drop exactly the higher id of each pair. The probe
  * asserts all three: survivor count, dropped-id pattern, n_dups histogram.
  *
  * What the timing demonstrates: the pair space is Σ|cluster|² =
  * N·64 comparisons (64 per row), vs N²/2 ≈ 5·10¹¹ for the unclustered
  * sweep at N=1M — the clustering bound, not kernel speed, is what makes
  * semantic dedup feasible at 100 TB. The cluster key here is the
  * pre-assigned column (the production path derives it from
  * IvfIndex.assign — that assignment pass is timed separately in
  * ScaleProbe's build/search rows).
  *
  * Usage: runMain graft.SemDedupScaleProbe [nVectors]
  */
object SemDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    require(n % 64 == 0, "n must be a multiple of the 64-member cluster size")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("semdedup_probe").toString
    var t0 = System.nanoTime()
    spark.range(n)
      .select(col("id").as("vec_id"),
        (col("id") / 64).cast("long").as("cluster"),
        expr("""transform(sequence(0, 63), i ->
                 CAST(CASE WHEN i = CAST(id % 64 AS INT)
                              - (CASE WHEN id % 64 % 10 = 9 THEN 1 ELSE 0 END)
                      THEN id % 5 + 1 ELSE 0 END AS FLOAT))""").as("embedding"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/vectors.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9

    val vecs = spark.read.parquet(s"$dir/vectors.parquet")
    t0 = System.nanoTime()
    val verdicts = graft.operators.DedupOps
      .semDedup(vecs, "vec_id", "cluster", "embedding", eps = 0.5)
      .localCheckpoint(true)
    val survivors = verdicts.filter(col("kept")).count()
    val sec = (System.nanoTime() - t0) / 1e9

    // exact verification (outside the timing)
    val clusters = n / 64
    val planted = 6L * clusters // j = 9,19,29,39,49,59 per cluster
    assert(survivors == n - planted,
      s"survivors $survivors != ${n - planted} (n=$n planted=$planted)")
    val dropped = verdicts.filter(!col("kept"))
    assert(dropped.filter(col("vec_id") % 64 % 10 =!= 9).count() == 0,
      "a non-planted member was dropped")
    val paired = verdicts.filter(col("n_dups") === 1).count()
    assert(paired == 2 * planted && verdicts.filter(col("n_dups") > 1).count() == 0,
      s"pair membership $paired != ${2 * planted}")

    println(f"[semdedup-probe] n=$n clusters=$clusters gen=$genSec%.1fs " +
      f"verdict=$sec%.1fs survivors=$survivors dropped=$planted " +
      f"pair_space=${n * 64}%d vs_allpairs=${n * n / 2}%d")
    spark.stop()
  }
}
