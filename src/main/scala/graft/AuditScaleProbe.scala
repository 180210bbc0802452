package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Audit-tier-at-scale probe: synthesizes an N-document corpus with
  * PLANTED violations and wall-clocks the validation surfaces cold over
  * on-disk parquet — the one-scan expectations suite (q112's shape,
  * including the keyed-distinct uniqueness rewrite, the expensive one)
  * and the key-skew audit over both a low-cardinality and a
  * high-cardinality key. Violation counts and skew stats are asserted
  * against closed-form truth BEFORE the timings print — a probe that
  * times wrong answers is worse than no probe.
  *
  * Planted (pure functions of doc_id):
  *   - id % 500000 == 3 → doc_id repeats the previous id (dup-id
  *     violations: n/500000 at 10M = 20 non-unique rows),
  *   - id % 1000000 == 7 → lang 'zz' (out of the accepted set: 10).
  *
  * Usage: runMain graft.AuditScaleProbe [nDocs]
  */
object AuditScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Expectations
    import graft.operators.Expectations._

    val dir = java.nio.file.Files.createTempDirectory("audit_probe").toString
    var t0 = System.nanoTime()
    spark.range(n)
      .select(
        expr("CASE WHEN id % 500000 = 3 THEN id - 1 ELSE id END").as("doc_id"),
        expr("""array_join(transform(sequence(1, 10 + pmod(hash(id), 11)),
                i -> concat('w', pmod(hash(id * 1009 + i), 5000))), ' ')""")
          .as("text"),
        expr("""CASE WHEN id % 1000000 = 7 THEN 'zz'
                ELSE element_at(array('en','es','de','fr','zh'),
                  1 + cast(pmod(hash(id), 5) AS INT)) END""").as("lang"),
        expr("concat('s', pmod(hash(id), 7))").as("source"),
        expr("pmod(id, 100000)").as("shard_key"))
      .withColumn("n_chars", length(col("text")))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // --- expectations suite, one scan over 10M rows ---
    t0 = System.nanoTime()
    val report = Expectations.run(docs, Seq(
      notNull("doc_id"), unique("doc_id"), notNull("text"),
      inSet("lang", Seq("en", "es", "de", "fr", "zh")),
      nonNegative("n_chars"),
      holds("chars_match", col("n_chars") === length(col("text")))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val expectSec = (System.nanoTime() - t0) / 1e9

    val plantedDups = (n + 500000 - 3 - 1) / 500000 // ids with id%500000==3
    val plantedLang = (n + 1000000 - 7 - 1) / 1000000
    require(report("unique(doc_id)") == plantedDups,
      s"unique found ${report("unique(doc_id)")}, planted $plantedDups")
    require(report("in_set(lang)") == plantedLang,
      s"in_set found ${report("in_set(lang)")}, planted $plantedLang")
    require(report("not_null(doc_id)") == 0 && report("chars_match") == 0)

    // --- key skew: 7-value hot key and 100k-value uniform key ---
    t0 = System.nanoTime()
    val hot = AuditQueries.keySkew(docs, "source", "source").first()
    val hotSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val uni = AuditQueries.keySkew(docs, "shard_key", "shard_key").first()
    val uniSec = (System.nanoTime() - t0) / 1e9

    require(hot.getAs[Long]("n_keys") == 7L)
    require(uni.getAs[Long]("n_keys") == math.min(n, 100000L))
    // uniform modular key: every key holds n/100000 rows → skew == 1
    if (n % 100000 == 0)
      require(uni.getAs[Double]("skew") == 1.0,
        s"uniform key skew ${uni.getAs[Double]("skew")}")

    println(s"""{"probe":"audit_scale","n_docs":$n,"gen_sec":${f"$genSec%.1f"},""" +
      s""""expectations_sec":${f"$expectSec%.1f"},"checks":6,""" +
      s""""dup_viol":${report("unique(doc_id)")},"lang_viol":${report("in_set(lang)")},""" +
      s""""skew_hot_sec":${f"$hotSec%.1f"},"skew_uniform_sec":${f"$uniSec%.1f"},""" +
      s""""hot_skew":${hot.getAs[Double]("skew")},"uniform_skew":${uni.getAs[Double]("skew")}}""")
    spark.stop()
  }
}
