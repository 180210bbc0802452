package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** Connected components + keep-canonical dedup vs a driver union-find. */
class DedupOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  // driverEdgeLimit = 0 forces the distributed min-label path; the
  // default exercises the driver union-find path — both must agree.
  private val paths = Seq("driver" -> DedupOps.DriverEdgeLimit, "distributed" -> 0L)

  paths.foreach { case (label, limit) =>
    test(s"connected components match union-find on a synthetic graph [$label]") {
      import spark.implicits._
      // two chains, one star, one isolated pair
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain 1-4
        (10L, 11L), (10L, 12L), (10L, 13L), // star at 10
        (20L, 21L)) // pair
      val got = DedupOps.connectedComponents(pairs.toDF("a", "b"), "a", "b",
        driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(pairs)
      assert(got == want, s"got $got want $want")
      assert(got.values.toSet == Set(1L, 10L, 20L))
    }

    test(s"long chain converges (diameter > 1 iteration) [$label]") {
      import spark.implicits._
      val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
      val got = DedupOps.connectedComponents(chain.toDF("a", "b"), "a", "b",
        driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 30 && got.values.forall(_ == 0L))
    }
  }

  test("empty pair list yields empty components on both paths") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    paths.foreach { case (label, limit) =>
      assert(DedupOps.connectedComponents(empty, "a", "b",
        driverEdgeLimit = limit).count() == 0, label)
    }
  }

  test("q37 keep-set equals union-find over the q22 pair graph") {
    val docs = Tables.load(spark, SparkSuite.sf001, "documents")
    val pairs = DedupQueries.q22JaccardNeardup(spark, SparkSuite.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val comps = unionFind(pairs)
    val losers = comps.filter { case (n, c) => n != c }.keySet
    val expectKeep = docs.select("doc_id").collect().map(_.getLong(0)).toSet -- losers
    val got = PipelineQueries.q37NeardupDedup(spark, SparkSuite.sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expectKeep)
    assert(pairs.nonEmpty, "q22 should find near-dups at sf0.01")
  }

  test("banded simhash recall guarantee holds at every radius 1..4") {
    // brute-force hamming over all sf0.001 signature pairs is the ground
    // truth (500 docs → 125k pairs); every banding radius must find
    // EXACTLY the pairs at its hamming threshold — recall is guaranteed
    // by pigeonhole, precision by the per-candidate verify filter
    val sig = DedupQueries.simhashSig(spark, SparkSuite.sf0001)
    val rows = sig.select("doc_id", "h1", "h2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = (for {
      (ida, a1, a2) <- rows; (idb, b1, b2) <- rows if ida < idb
      h = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
    } yield (ida, idb, h)).toSeq
    for (radius <- 1 to 4) {
      val want = exact.filter(_._3 <= radius)
        .map { case (a, b, h) => (a, b, h) }.toSet
      val got = DedupQueries.simhashBandedPairs(sig, radius)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"radius $radius: got ${got.size}, want ${want.size}")
    }
  }
}
