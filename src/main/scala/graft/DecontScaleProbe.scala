package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontamination-at-scale probe: the MARGINAL cost the
  * [[CurationRun.Decontaminate]] option adds to a 10M-document curation
  * run, timed stage by stage (the 505 s end-to-end number already on
  * record — BASELINE.md — stays the baseline; this is the delta a
  * release audit pays for the benchmark-leak guarantee).
  *
  * The benchmark suite is synthesized AS real leaks: every ~10,000th
  * corpus document's text becomes an eval example, so those documents
  * (and their planted near-dup copies, which share all but one
  * trailing token) are true containment hits — the probe asserts the
  * detector finds at least every exact source. Stages:
  *
  *   - `detect`: [[DedupQueries.benchContainment]] over the full
  *     corpus vs the broadcast suite → distinct contaminated doc ids
  *     (ONE corpus scan; text never shuffles);
  *   - `drop`: the anti-join that removes them from an export stream
  *     (the exact shape [[CurationRun.exportCurated]] composes).
  *
  * Cold reads off on-disk parquet. Prints one JSON line for
  * BASELINE.md. Usage: runMain graft.DecontScaleProbe [nDocs] [nBench]
  */
object DecontScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val nBench = if (args.length > 1) args(1).toLong else 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("decont_probe").toString
    val genSec = DedupScaleProbe.writePlantedCorpus(spark, n, cpus.toInt, dir)
    System.err.println(f"[probe] gen     $genSec%8.1f s")

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    // every ~(n/nBench)th doc's text IS an eval example → a true leak;
    // skip ids whose text is a mutation target (id%10==9 / id%100==55
    // re-derive another doc's text) so each example has one exact source
    val stride = math.max(1L, n / nBench)
    val bench = docs
      .filter(col("doc_id") % stride === 3 && col("doc_id") % 10 =!= 9)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val nPlanted = bench.count()
    System.err.println(s"[probe] bench examples=$nPlanted")

    // no blanket block-drop here (the DedupScaleProbe convention would
    // evict the bench pin both stages read); nothing corpus-scale is
    // resident — gen wrote straight to parquet
    System.gc()
    var t0 = System.nanoTime()
    val bad = DedupQueries.benchContainment(docs, bench)
      .filter(col("contaminated"))
      .select(col("corpus_doc").as("doc_id")).distinct()
      .localCheckpoint(true)
    val nBad = bad.count()
    val detectSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] detect  $detectSec%8.1f s  contaminated=$nBad")
    // every exact source must be caught (C = 1.0 against its own text)
    val sources = bench.select((col("doc_id") - 1000000000L).as("doc_id"))
    val missed = sources.join(bad, Seq("doc_id"), "left_anti").count()
    require(missed == 0, s"$missed planted leak sources undetected")
    require(nBad >= nPlanted, s"found $nBad < planted $nPlanted")

    t0 = System.nanoTime()
    val kept = docs.join(
      graft.operators.DedupOps.gateKnown(bad, nBad), Seq("doc_id"),
      "left_anti").count()
    val dropSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] drop    $dropSec%8.1f s  kept=$kept")
    require(kept == n - nBad, s"kept $kept != $n - $nBad")

    println(s"""{"probe":"decontaminate","n_docs":$n,"n_bench":$nPlanted,""" +
      s""""gen_sec":${f"$genSec%.1f"},"detect_sec":${f"$detectSec%.1f"},""" +
      s""""drop_sec":${f"$dropSec%.1f"},"contaminated":$nBad}""")
    spark.stop()
  }
}
