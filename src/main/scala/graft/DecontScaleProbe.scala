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

    // ---- REWRITE mode (q131's span surgery — the mode a data-quality
    // team prefers) at the same scale: detect+rewrite wall, then the
    // exportCurated(Rewrite) join-back/reassembly wall, with the
    // invariants asserted IN-RUN: every planted source doc is fully
    // excised (its whole text IS a bench example, so every chunk
    // leaks → empty), and kept-token counts are exactly explained by
    // the removed chunks (8 tokens each, except a doc's short last
    // chunk) — token conservation, not just "some text got shorter".
    graft.operators.DedupOps.releaseCheckpoint(bad)
    System.gc()
    t0 = System.nanoTime()
    val rew = AnalyticsQueries
      .decontaminateRewrite(docs.select("doc_id", "text"), bench)
      .filter(col("n_removed") > 0)
      .localCheckpoint(true)
    val nRew = rew.count()
    val rewriteSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] rewrite $rewriteSec%8.1f s  rewritten=$nRew")

    t0 = System.nanoTime()
    val cleanCount = docs.join(
        graft.operators.DedupOps.gateKnown(
          rew.select(col("doc_id"), col("text_kept")), nRew),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_kept"), col("text")).as("text"))
      .filter(length(trim(col("text"))) > 0)
      .count()
    val applySec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] apply   $applySec%8.1f s  clean_docs=$cleanCount")

    // invariants over the touched set (leak-sized, not corpus-sized)
    val stats = rew
      .join(docs.select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("orig")),
        "doc_id")
      .withColumn("kept_tok",
        when(length(trim(col("text_kept"))) === 0, 0L)
          .otherwise(size(split(trim(col("text_kept")), "\\s+")).cast("long")))
      .withColumn("last_len", col("orig") - lit(8L) * (col("n_chunks") - 1))
      .localCheckpoint(true)
    val broken = stats.filter(
      !(col("kept_tok") === col("orig") - lit(8L) * col("n_removed") ||
        col("kept_tok") === col("orig") - lit(8L) * (col("n_removed") - 1) -
          col("last_len"))).count()
    require(broken == 0, s"$broken docs violate token conservation")
    // a source doc IS a bench example, so every FULL 8-token chunk of it
    // leaks and is cut; only the trailing orig%8-token fragment can
    // survive — shorter than one shingle, so by the engine's own 8-gram
    // rule the remnant cannot leak. Assert that exact remnant size for
    // EVERY source (858/1000 of the planted sources have orig%8 != 0,
    // so "rewrites to empty" would be the wrong invariant here).
    val sourcesWrong = sources.join(
      stats.filter(col("kept_tok") === pmod(col("orig"), lit(8L))),
      Seq("doc_id"), "left_anti").count()
    require(sourcesWrong == 0,
      s"$sourcesWrong planted leak sources kept more than the sub-shingle remnant")
    // the apply join-back must drop EXACTLY the empty rewrites
    val fullExcised = stats.filter(col("kept_tok") === 0).count()
    require(cleanCount == n - fullExcised,
      s"clean_docs $cleanCount != $n - fully-excised $fullExcised")

    println(s"""{"probe":"decontaminate","n_docs":$n,"n_bench":$nPlanted,""" +
      s""""gen_sec":${f"$genSec%.1f"},"detect_sec":${f"$detectSec%.1f"},""" +
      s""""drop_sec":${f"$dropSec%.1f"},"contaminated":$nBad,""" +
      s""""rewrite_sec":${f"$rewriteSec%.1f"},"apply_sec":${f"$applySec%.1f"},""" +
      s""""rewritten":$nRew}""")
    spark.stop()
  }
}
