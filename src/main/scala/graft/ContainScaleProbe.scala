package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Containment-at-scale probe on a BOILERPLATE-HEAVY corpus — the
  * regime the prefix filter (q118b) exists for. DedupScaleProbe's
  * corpus has near-unique shingles (df ≈ 1), which is the prefix
  * filter's worst case: every join bucket is already tiny, so the
  * filter's extra rank/verify machinery only adds constant overhead
  * (measured ~1.2× there). Real crawl text is the opposite — shared
  * phrases put the bulk of the shingle mass in mid-df buckets — and
  * this probe synthesizes exactly that:
  *
  *   - every doc carries `BoilerTokens` tokens of boilerplate drawn
  *     from a phrase pool sized so each boiler shingle lands in
  *     ~`BoilerDf` documents (mid-frequency: well UNDER the df cap, so
  *     the cap cannot save the full join from them), plus a unique body;
  *   - every 10th doc is a near-superset of its predecessor (unique
  *     body kept, extra tokens appended) → planted containment pairs
  *     with exact floors, like DedupScaleProbe's.
  *
  * The full q118 join must grind through ~BoilerDf-sized buckets for
  * every boilerplate shingle instance; q118b's prefix (the globally
  * RAREST ⌊n/10⌋+1 shingles per doc = the unique body) never touches
  * them during candidate generation. Equality of the two pair sets is
  * asserted (the filter is lossless), so the timing gap is pure plan.
  *
  * Usage: runMain graft.ContainScaleProbe [nDocs]
  */
object ContainScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val BoilerTokens = 12L // boiler tokens per doc (→ ~10-12 boiler shingles)
    val BoilerDf = 24L // target docs per boiler shingle (mid-df, under cap 64)
    // pool of phrase ids sized so each phrase lands in ~BoilerDf docs
    val phrasePool = math.max(1L, n / BoilerDf)

    val dir = java.nio.file.Files.createTempDirectory("contain_probe").toString
    var t0 = System.nanoTime()
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr("CASE WHEN id % 10 = 9 THEN id - 1 ELSE id END").as("base"))
      .select(col("doc_id"),
        concat(
          // boilerplate: one shared phrase per doc, picked by BASE so a
          // near-superset keeps its source's boilerplate too
          array_join(expr(
            s"""transform(sequence(1, $BoilerTokens),
                i -> concat('bp', pmod(hash(base), $phrasePool), '_', i))"""), " "),
          lit(" "),
          // unique body: 15-35 tokens seeded by base (rare shingles)
          array_join(expr(
            """transform(sequence(1, 15 + pmod(hash(base), 21)),
               i -> concat('w', base, '_', pmod(hash(base * 1009 + i), 5000)))"""), " "),
          // near-superset mutation: extra tokens appended to the copy
          expr("""CASE WHEN doc_id % 10 = 9
                  THEN concat(' x', doc_id, ' y', doc_id, ' z', doc_id)
                  ELSE '' END""")).as("text"),
        lit("en").as("lang"), lit("s0").as("source"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val genSec = (System.nanoTime() - t0) / 1e9

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      System.gc()
      val t = System.nanoTime()
      val rows = fn(spark, dir).count()
      ((System.nanoTime() - t) / 1e9, rows)
    }
    val (fullSec, fullPairs) = timed(DedupQueries.q118Containment)
    val (prefSec, prefPairs) = timed(DedupQueries.q118bContainmentPrefix)

    // lossless: the prefix filter must find the SAME pair set
    require(prefPairs == fullPairs,
      s"prefix containment found $prefPairs pairs vs full $fullPairs")
    // every planted (base, base+suffix) pair is C = 1.0 — floor exact;
    // boilerplate sharing may add a handful of coincidental pairs only
    // if two docs' capped sets overlap 90%, which the unique bodies
    // prevent, so the count is exactly the planted n/10
    require(fullPairs >= n / 10 - 1,
      s"containment found $fullPairs pairs, planted ≈ ${n / 10}")

    println(s"""{"probe":"contain_scale","n_docs":$n,"gen_sec":$genSec,""" +
      s""""boiler_df":$BoilerDf,"full_sec":$fullSec,"full_pairs":$fullPairs,""" +
      s""""prefix_sec":$prefSec,"prefix_pairs":$prefPairs,""" +
      s""""speedup":${fullSec / prefSec}}""")
    spark.stop()
  }
}
