package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Selection-at-scale probe: synthesizes an N-doc corpus with a
  * REALISTICALLY SKEWED domain distribution (one mega-domain holding
  * ~25% of the corpus, a band of large mid domains, and a Zipf tail of
  * millions of tiny domains) and wall-clocks the q90 domain-cap shape
  * against the naive single-window implementation, plus the q92
  * exchange-free blocklist scan. Results are VERIFIED, not just timed:
  * kept counts must equal sum(min(count, CAP)) per source exactly.
  *
  * The interesting number is the naive-vs-shipped gap: the naive
  * `row_number over (partition by source)` funnels the mega-domain's
  * quarter of the corpus through ONE task, while the shipped shape
  * anti-joins the under-cap tail straight through (zero shuffle for
  * the bulk of rows-by-count) and salt-pre-prunes the few hot domains
  * so no task ever sees more than SALT·CAP rows of any one of them.
  * q91's scale profile is q22's (shared shingle machinery) — see
  * DedupScaleProbe; q93's ranking layer is ShuffleScaleProbe's.
  *
  * Usage: runMain graft.SelectionScaleProbe [nDocs]
  */
object SelectionScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("sel_probe").toString
    var t0 = System.nanoTime()
    spark.range(n)
      .select(col("id").as("doc_id"),
        // skew: 25% mega, 25% across 20 mid domains, 50% across n/5
        // tiny tail domains (avg ~2.5 docs each — all under any cap)
        expr(s"""CASE WHEN id % 4 = 0 THEN 'mega'
                 WHEN id % 4 = 1 THEN concat('mid', pmod(hash(id), 20))
                 ELSE concat('tail', pmod(hash(id * 31), ${math.max(n / 5, 1)}))
                 END""").as("source"),
        // body: 10-20 vocab tokens; every 7th doc carries a blocklist hit
        concat(
          array_join(expr(
            """transform(sequence(1, 10 + pmod(hash(id), 11)),
               i -> concat('w', pmod(hash(id * 1009 + i), 5000)))"""), " "),
          expr("CASE WHEN id % 7 = 3 THEN ' slow' ELSE '' END")).as("text"))
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", expr("concat('l', pmod(hash(doc_id), 5))"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9

    // ground truth (outside the timings): per-source min(count, CAP)
    val docs = Tables.load(spark, dir, "documents")
    val expectedKept = docs.groupBy("source").count()
      .select(sum(least(col("count"), lit(20L)))).head().getLong(0)
    val megaRows = docs.filter(col("source") === "mega").count()

    t0 = System.nanoTime()
    val kept = SelectionQueries.q90DomainCap(spark, dir).count()
    val capSec = (System.nanoTime() - t0) / 1e9
    require(kept == expectedKept, s"q90 kept $kept != expected $expectedKept")

    // naive contrast: one window over everything — the mega-domain's
    // 25% of the corpus sorts on a single task
    t0 = System.nanoTime()
    val naiveKept = docs.withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rn") <= 20).count()
    val naiveSec = (System.nanoTime() - t0) / 1e9
    require(naiveKept == expectedKept, s"naive kept $naiveKept != $expectedKept")

    t0 = System.nanoTime()
    val flagged = SelectionQueries.q92BlocklistFilter(spark, dir)
      .filter(!col("keep")).count()
    val blockSec = (System.nanoTime() - t0) / 1e9
    require(flagged == (3L to n - 1 by 7).size,
      s"q92 flagged $flagged != ${(3L to n - 1 by 7).size}")

    println(s"""{"probe":"selection","n_docs":$n,"gen_sec":${f"$genSec%.1f"},""" +
      s""""mega_rows":$megaRows,"kept":$kept,""" +
      s""""q90_capped_sec":${f"$capSec%.1f"},"q90_naive_window_sec":${f"$naiveSec%.1f"},""" +
      s""""q92_flagged":$flagged,"q92_scan_sec":${f"$blockSec%.1f"}}""")
    spark.stop()
  }
}
