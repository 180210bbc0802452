package graft

import org.scalatest.funsuite.AnyFunSuite

/** q94 SemDeDup vs a driver-side exact recompute of the same rule
  * (cluster = label, ε-neighbors on 4dp-rounded cosine, keep the
  * (cent_sim, vec_id)-minimum of each neighborhood). The oracle gate
  * proves cross-engine parity; this proves the rule itself. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf001
  private val Eps = 0.35

  private def r4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q94 verdicts equal the exact driver recompute") {
    val rows = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // float centroid per label — same narrowing as gf.vector_mean's output
    val cents = rows.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      val sums = Array.fill(dim)(0.0)
      vs.foreach(v => (0 until dim).foreach(i => sums(i) += v._3(i)))
      l -> sums.map(s => (s / vs.length).toFloat)
    }
    val centSim = rows.map(v => v._1 -> r4(cosine(v._3, cents(v._2)))).toMap
    val expect = rows.map { case (id, l, emb) =>
      val nbrs = rows.filter(o => o._2 == l && o._1 != id &&
        r4(cosine(emb, o._3)) >= Eps)
      val ord = Ordering.Tuple2[Double, Long]
      val dominated = nbrs.exists(o =>
        ord.lt((centSim(o._1), o._1), (centSim(id), id)))
      id -> ((nbrs.length.toLong, !dominated))
    }.toMap
    val got = DedupQueries.q94SemDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == expect)
    // sanity on the fixture itself: the graph is non-trivial and dedup
    // actually removes something
    assert(expect.values.exists(_._1 > 0) && expect.values.exists(!_._2))
  }

  test("every cluster keeps its (cent_sim, vec_id)-minimum member") {
    val df = DedupQueries.q94SemDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(4)))
    df.groupBy(_._2).foreach { case (_, vs) =>
      val m = vs.minBy(v => (v._3, v._1))
      assert(m._4, s"cluster minimum ${m._1} must survive")
    }
  }
}
