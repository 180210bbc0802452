package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing-at-scale probe: synthesizes an N-document corpus
  * with a MEGA-LANGUAGE (90% of documents in one lang — the 100 TB
  * crawl regime q132's plan was rewritten for) and wall-clocks the
  * contested stage both ways on identical input:
  *
  *   - `window`: the per-language running-sum window
  *     (`Window.partitionBy(lang)`) — the banned shape, which funnels
  *     the mega-language's whole (doc_id, lang, n) stream through ONE
  *     task's sort;
  *   - `ranged`: [[graft.operators.RankOps.runningSumPer]] — the
  *     shipped range-exchange prefix sum, whose (_pid, lang)-local
  *     accumulation windows are bounded by the PHYSICAL partition
  *     size regardless of language share.
  *
  * Equality of both offset sums is asserted (same numbers, different
  * plan), then the FULL [[CurationQueries.packSequences]] runs end to
  * end and its invariants are checked: per-language total packed
  * tokens equal the corpus token count, sequence ids are dense
  * 0..⌈tokens/L⌉-1, every interior sequence holds exactly L tokens.
  * Prints one JSON line for BASELINE.md. Timings are COLD reads off
  * on-disk parquet (the honest 100 TB shape).
  *
  * Usage: runMain graft.PackScaleProbe [nDocs] [seqLen]
  */
object PackScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val seqLen = if (args.length > 1) args(1).toLong else 2048L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 90/10 language skew, 15-35 vocab tokens per doc, all codegen
    val dir = java.nio.file.Files.createTempDirectory("pack_probe").toString
    val tGen = System.nanoTime()
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr("CASE WHEN id % 10 < 9 THEN 'en' " +
          "ELSE concat('l', pmod(hash(id), 4)) END").as("lang"),
        array_join(expr(
          """transform(sequence(1, 15 + pmod(hash(id), 21)),
             i -> concat('w', pmod(hash(id * 1009 + i), 5000)))"""), " ")
          .as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val genSec = (System.nanoTime() - tGen) / 1e9
    System.err.println(f"[probe] gen       $genSec%8.1f s")

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def narrow = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n"))

    def cool(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    // the banned single-task shape, timed for the ledger (same input,
    // same forced aggregate — only the offset plan differs)
    cool()
    val tWin = System.nanoTime()
    val w = Window.partitionBy("lang").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winSum = narrow.withColumn("endp", sum("n").over(w))
      .agg(sum(col("endp"))).first().getLong(0)
    val winSec = (System.nanoTime() - tWin) / 1e9
    System.err.println(f"[probe] window    $winSec%8.1f s  sum=$winSum")

    cool()
    val tRng = System.nanoTime()
    val rngSum = graft.operators.RankOps
      .runningSumPer(narrow, "lang", Seq(col("doc_id").asc), "n", "endp")
      .agg(sum(col("endp"))).first().getLong(0)
    val rngSec = (System.nanoTime() - tRng) / 1e9
    System.err.println(f"[probe] ranged    $rngSec%8.1f s  sum=$rngSum")
    assert(winSum == rngSum,
      s"offset plans disagree: window=$winSum ranged=$rngSum")

    // the same stage under RELIABLE pins (graft.operators.Pins): the
    // fault-tolerance tax a multi-hour run pays to survive executor
    // loss — the pin becomes a checkpoint-FS write+read of the narrow
    // ranked projection instead of executor blocks
    cool()
    val ckptDir = java.nio.file.Files.createTempDirectory("pack_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    spark.conf.set(graft.operators.Pins.ReliableConf, "true")
    val tRel = System.nanoTime()
    val relSum = graft.operators.RankOps
      .runningSumPer(narrow, "lang", Seq(col("doc_id").asc), "n", "endp")
      .agg(sum(col("endp"))).first().getLong(0)
    val relSec = (System.nanoTime() - tRel) / 1e9
    spark.conf.set(graft.operators.Pins.ReliableConf, "false")
    System.err.println(f"[probe] reliable  $relSec%8.1f s  sum=$relSum")
    assert(relSum == rngSum, s"reliable pin changed the result: $relSum")

    // full packing end to end on the shipped plan
    cool()
    val tPack = System.nanoTime()
    val packed = CurationQueries.packSequences(docs, seqLen)
      .localCheckpoint(true)
    val nSeqs = packed.count()
    val packSec = (System.nanoTime() - tPack) / 1e9
    System.err.println(f"[probe] pack      $packSec%8.1f s  seqs=$nSeqs")

    // invariants: token conservation, dense seq ids, exact-L interiors
    val tokTotal = narrow.agg(sum("n")).first().getLong(0)
    val packTotal = packed.agg(sum("n_tokens")).first().getLong(0)
    assert(tokTotal == packTotal,
      s"token loss: corpus=$tokTotal packed=$packTotal")
    val bad = packed
      .withColumn("max_sid",
        max(col("seq_id")).over(Window.partitionBy("lang")))
      .filter(col("seq_id") < col("max_sid") &&
        col("n_tokens") =!= seqLen)
      .count()
    assert(bad == 0, s"$bad interior sequences not exactly $seqLen tokens")
    val perLang = packed.groupBy("lang")
      .agg(count(lit(1)).as("n_seqs"), max("seq_id").as("max_sid"))
      .filter(col("n_seqs") =!= col("max_sid") + 1).count()
    assert(perLang == 0, "sequence ids must be dense per language")

    println(s"""{"probe":"pack","n":$n,"seq_len":$seqLen,""" +
      s""""gen_sec":${f"$genSec%.1f"},"window_offsets_sec":${f"$winSec%.1f"},""" +
      s""""ranged_offsets_sec":${f"$rngSec%.1f"},""" +
      s""""reliable_offsets_sec":${f"$relSec%.1f"},""" +
      s""""pack_sec":${f"$packSec%.1f"},""" +
      s""""n_seqs":$nSeqs,"tokens":$tokTotal}""")
    spark.stop()
  }
}
