package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Export-at-scale probe: wall-clocks [[graft.sources.TrainingExport]]
  * over an N-document synthetic corpus, cold from on-disk parquet —
  * the write side (stamp + one hash shuffle + per-shard sorted write +
  * map-side-combined manifest stats) and the read side (verifyShards:
  * one scan of the export recomputing rows/tokens/digests).
  *
  * What the timing demonstrates: the export is ONE shuffle of the
  * corpus no matter how many shards, the manifest adds no extra pass
  * over what the write already scans, and certification costs exactly
  * one more scan. Correctness is asserted, not assumed: the manifest
  * must conserve rows and tokens against driver-computed truth, and
  * verifyShards must return clean.
  *
  * Usage: runMain graft.ExportScaleProbe [nDocs] [nShards]
  */
object ExportScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val shards = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("export_probe").toString
    var t0 = System.nanoTime()
    // deterministic text: id-dependent token count (5 + id%12 words)
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr("""array_join(transform(sequence(1, CAST(5 + id % 12 AS INT)),
                 i -> concat('w', CAST((id * 31 + i) % 997 AS STRING))), ' ')""")
          .as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9

    val docs = spark.read.parquet(s"$dir/docs.parquet")
    t0 = System.nanoTime()
    val manifest = graft.sources.TrainingExport
      .exportShards(docs, s"$dir/export", shards, seed = 1L)
    val exportSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val bad = graft.sources.TrainingExport.verifyShards(spark, s"$dir/export")
    val verifySec = (System.nanoTime() - t0) / 1e9

    // exact verification (outside the timings)
    assert(bad.isEmpty, s"verifyShards flagged shards: $bad")
    assert(manifest.size == shards, s"expected $shards shards, got ${manifest.size}")
    assert(manifest.map(_.rows).sum == n, "manifest must conserve rows")
    // token truth: sum over ids of (5 + id % 12); count per residue class
    val per = n / 12; val rem = n % 12
    val expectedToks = (0L until 12L)
      .map(r => (5L + r) * (per + (if (r < rem) 1L else 0L))).sum
    assert(manifest.map(_.tokens).sum == expectedToks,
      s"manifest tokens ${manifest.map(_.tokens).sum} != $expectedToks")
    val skew = manifest.map(_.rows).max.toDouble / (n.toDouble / shards)
    println(f"[export-probe] n=$n shards=$shards gen=$genSec%.1fs " +
      f"export=$exportSec%.1fs verify=$verifySec%.1fs maxShardSkew=$skew%.3f")
    spark.stop()
  }
}
