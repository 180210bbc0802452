package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Weighted-sampler-at-scale probe for STRING row ids: r10 made
  * [[graft.operators.WeightedSample.exactKPerGroup]] key its winner
  * semi join on the id's NATIVE type so URL/hash-keyed crawl corpora
  * sample without a pre-mapping to longs (`top_k_by_str`), and the
  * spec gates determinism + partitioning-invariance — but the string
  * path was never scale-probed: URL-length ids inflate the TopKAgg
  * buffers (k ids × ~70 bytes per group per task vs 8-byte longs) and
  * the winner join's broadcast. This probe wall-clocks the SAME
  * Efraimidis-Spirakis sample over an N-doc corpus twice — long ids
  * vs synthetic-URL ids (~70 chars), identical weights and grouping,
  * one mega-source holding 60% of the corpus (the crawl regime) — and
  * asserts in-run:
  *
  *   - exact-k: every source yields min(k, |source|) winners, both
  *     paths;
  *   - determinism: the string path re-run with the same seed selects
  *     the IDENTICAL winner set (checksum over selected urls);
  *   - same statistical scheme: both paths key the per-row uniform on
  *     xxhash64(seed, id), so the SELECTIONS differ (different id
  *     encodings hash differently) but the counts must match exactly.
  *
  * Timings are cold reads off on-disk parquet. Prints one JSON line
  * for BASELINE.md. Usage: runMain graft.SampleScaleProbe [nDocs] [k]
  * (needs SPARK_DRIVER_MEM=64g at the 10M default, like the other
  * probes). */
object SampleScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val k = if (args.length > 1) args(1).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 60% mega-source + 8 tail sources; URL-length string ids derived
    // 1:1 from the long id (same rows, two key encodings); lognormal-ish
    // positive weights
    val dir = java.nio.file.Files.createTempDirectory("sample_probe").toString
    val tGen = System.nanoTime()
    spark.range(n)
      .select(col("id").as("doc_id"),
        expr("CASE WHEN id % 10 < 6 THEN 'crawl-main' " +
          "ELSE concat('src', pmod(hash(id), 8)) END").as("source"),
        concat(lit("https://host-"), pmod(hash(col("id")), lit(997)),
          lit(".example.com/archive/"),
          lpad(conv(col("id").cast("string"), 10, 16), 12, "0"),
          lit("/page-"), pmod(hash(col("id") * 31), lit(100000)),
          lit(".html")).as("url"),
        ((pmod(hash(col("id") * 7), lit(1000)) + 1).cast("double") / 100.0)
          .as("weight"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val genSec = (System.nanoTime() - tGen) / 1e9
    System.err.println(f"[probe] gen        $genSec%8.1f s")

    def docs = spark.read.parquet(s"$dir/docs.parquet")
    def cool(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    // group sizes, for the exact-k assertion (min(k, |source|))
    val sizes = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectTotal = sizes.values.map(math.min(_, k.toLong)).sum

    def runPath(idCol: String): (Double, Long) = {
      cool()
      val t0 = System.nanoTime()
      val sampled = graft.operators.WeightedSample.exactKPerGroup(
        docs, col("source"), col(idCol), col("weight"), k, seed = 42L)
      val perGroup = sampled.groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      sizes.foreach { case (s, sz) =>
        assert(perGroup.getOrElse(s, 0L) == math.min(sz, k.toLong),
          s"$idCol path: source $s sampled ${perGroup.getOrElse(s, 0L)} " +
            s"of $sz, want min($k, $sz)")
      }
      (sec, perGroup.values.sum)
    }

    // INTERLEAVED double reps, min per path: host IO throughput swings
    // 3-4× between back-to-back cold runs (the documented probe-noise
    // regime — BASELINE.md's PackScaleProbe canary note), and a single
    // A-then-B ordering attributes whichever swing hits second to the
    // code. Alternating and taking mins bounds the attribution error.
    val reps = Seq("doc_id", "url", "doc_id", "url").map { idCol =>
      val (sec, total) = runPath(idCol)
      System.err.println(f"[probe] ${idCol}%-10s $sec%8.1f s  n=$total")
      assert(total == expectTotal,
        s"exact-k totals: $idCol=$total want=$expectTotal")
      idCol -> sec
    }
    val longSec = reps.collect { case ("doc_id", s) => s }.min
    val strSec = reps.collect { case ("url", s) => s }.min

    // determinism: same seed -> identical winner SET on the string
    // path (order-independent xor fold — a SUM of full-range xxhash64
    // longs overflows under ANSI)
    cool()
    def strChecksum(): Long = graft.operators.WeightedSample
      .exactKPerGroup(docs, col("source"), col("url"), col("weight"),
        k, seed = 42L)
      .agg(expr("bit_xor(xxhash64(url))")).first().getLong(0)
    val c1 = strChecksum()
    val c2 = strChecksum()
    assert(c1 == c2, s"string sampler nondeterministic: $c1 vs $c2")

    println(s"""{"probe":"sample_scale","n":$n,"k":$k,""" +
      s""""gen_s":${f"$genSec%.1f"},"long_ids_s":${f"$longSec%.1f"},""" +
      s""""string_ids_s":${f"$strSec%.1f"},""" +
      s""""string_over_long":${f"${strSec / longSec}%.2f"},""" +
      s""""sampled":$expectTotal,"deterministic":true}""")
    spark.stop()
  }
}
