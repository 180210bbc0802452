package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.gf

/** The bloom-pruned contamination sweep (q87) and its expression.
  *
  * q87's claim is exactness-with-pruning: the Bloom pre-filter may pass
  * false positives (killed by the exact verify join) but never drops a
  * true match, so the output is row-identical to q55's broadcast-join
  * plan while only bloom survivors reach the join.
  */
class BloomPruneSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  test("bloom_might_contain: no false negatives, bounded false positives") {
    val members = (0L until 5000L).map(_ * 7919L)
    val bf = members.toDF("h").stat.bloomFilter("h", 5000, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val probes = (0L until 20000L).toDF("h")
      .select(col("h"), gf.bloom_might_contain(col("h") * 7919L, bc).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    // every member answers true — bloom filters cannot false-negative
    assert((0L until 5000L).forall(probes(_)), "false negative")
    // non-members (5000..20000)*7919 were never inserted; fpp 1% with
    // slack for hash clustering
    val fp = (5000L until 20000L).count(probes(_))
    assert(fp < 15000 * 0.03, s"false-positive rate too high: $fp/15000")
  }

  test("bloom_might_contain is null-intolerant and codegen-consistent") {
    val bf = Seq(1L).toDF("h").stat.bloomFilter("h", 16, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val out = Seq(Some(1L), None, Some(2L)).toDF("h")
      .select(gf.bloom_might_contain(col("h"), bc).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq == Seq(true, null, false))
  }

  test("q87 output is row-identical to q55's broadcast-join plan") {
    val dir = SparkSuite.sf0001
    val exact = SparkEntry.queries("q55_contamination")(spark, dir)
      .collect().map(_.toSeq).toSet
    val bloom = SparkEntry.queries("q87_bloom_contamination")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(exact.nonEmpty, "contamination sweep must find planted overlaps")
    assert(bloom == exact,
      s"bloom plan diverged: only-exact=${exact -- bloom} only-bloom=${bloom -- exact}")
  }

  test("q87 prunes the corpus side below the verify join") {
    val dir = SparkSuite.sf0001
    val p = SparkEntry.queries("q87_bloom_contamination")(spark, dir)
      .queryExecution.executedPlan.toString
    val probeAt = p.indexOf("bloom_might_contain")
    assert(probeAt >= 0, s"bloom probe optimized away:\n${p.take(1200)}")
    // plan strings print top-down: the join must appear ABOVE the probe
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0 && joinAt < probeAt,
      "bloom probe must sit on the scan side, below the verify join")
  }

  test("the bloom prune rejects almost all clean corpus shingles") {
    val dir = SparkSuite.sf0001
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(gf.shingles(col("text"), 3))).as("s"))
    val bench = sh.filter(col("doc_id") < 10)
    val bf = bench.select(xxhash64(col("s")).as("h")).stat.bloomFilter("h", 1 << 16, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val corpus = sh.filter(col("doc_id") >= 10).cache()
    try {
      val total = corpus.count()
      val kept = corpus.filter(gf.bloom_might_contain(xxhash64(col("s")), bc)).count()
      val trueHits = corpus.join(bench.select("s").distinct(), "s").count()
      // survivors = true matches + ~1% fp of the clean remainder; allow 3×
      assert(kept >= trueHits, "prune dropped a true match")
      assert(kept - trueHits <= math.max(50L, (total - trueHits) / 33),
        s"prune too weak: kept=$kept trueHits=$trueHits total=$total")
    } finally corpus.unpersist()
  }
}
