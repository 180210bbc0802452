package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.gf

/** BPE merge learning (q95) vs the textbook example and a driver-side
  * exact recompute of the full algorithm on real corpus words. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("merge pass kernel is the greedy left-to-right scan") {
    import spark.implicits._
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"))
      .toDF("sym").select(gf.bpe_merge(col("sym"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a")) // no chaining through a merged token
    assert(out(1) == Seq("aa", "aa"))
    assert(out(2) == Seq("b", "aa"))
  }

  test("textbook corpus learns the classic merge sequence") {
    import spark.implicits._
    // Sennrich et al.'s running example: {low:5, lower:2, newest:6, widest:3}
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => (w, w)).toDF("doc_id", "text")
    val merges = PipelineQueries.learnBpeMerges(docs, 5)._1
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)))
  }

  test("q96 fertility equals an exact driver recompute") {
    val dir = SparkSuite.sf0001
    val merges = PipelineQueries.q95BpeMerges(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2)))
    def encode(w: String): Vector[String] = {
      var sym = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
      sym
    }
    val words = Tables.load(spark, dir, "documents")
      .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = words.groupBy(_._1).map { case (lang, ws) =>
      val toks = ws.map { case (_, w) => encode(w).size.toLong }.sum
      val bytes = ws.map(_._2.length.toLong).sum
      lang -> ((ws.length.toLong, r4(toks.toDouble / ws.length),
        r4(bytes.toDouble / toks)))
    }
    val got = PipelineQueries.q96BpeFertility(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expect)
  }

  test("q95 equals an exact driver recompute on the real corpus") {
    val dir = SparkSuite.sf0001
    // driver-side reference implementation from collected word counts
    val freqs = Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var forms = freqs.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to 8) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      forms.foreach { case (sym, f) =>
        sym.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      expect += ((r, a, b, c))
      forms = forms.map { case (sym, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += sym(i); i += 1 }
        }
        (out.result(), f)
      }
    }
    val got = PipelineQueries.q95BpeMerges(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)
  }
}
