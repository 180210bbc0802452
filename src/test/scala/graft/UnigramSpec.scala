package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{gf, TextKernels}

/** Unigram-LM tokenizer training (q128/q129, Kudo 2018 hard-EM variant):
  * the Viterbi kernel against brute-force enumeration, hard-EM's
  * likelihood monotonicity, coverage/determinism invariants, and the
  * fertility metric against an exact driver recompute. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def segment(words: Seq[String], vocab: Seq[(String, Double)]): Seq[Seq[String]] = {
    import spark.implicits._
    words.toDF("w").select(gf.unigram_segment(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  /** Exhaustive max-likelihood segmentation — the oracle for the DP. */
  private def brute(s: String, vocab: Map[String, Double]): Double = {
    if (s.isEmpty) return 0.0
    var best = Double.NegativeInfinity
    for (i <- 1 to s.length) {
      val lp = vocab.getOrElse(s.substring(0, i),
        if (i == 1) TextKernels.UnkCharLogp else Double.NegativeInfinity)
      if (lp != Double.NegativeInfinity) {
        val rest = brute(s.substring(i), vocab)
        if (lp + rest > best) best = lp + rest
      }
    }
    best
  }

  private def scoreOf(pieces: Seq[String], vocab: Map[String, Double]): Double =
    pieces.map(p => vocab.getOrElse(p,
      if (p.length == 1) TextKernels.UnkCharLogp else Double.NegativeInfinity)).sum

  test("viterbi kernel matches brute-force max-likelihood enumeration") {
    val vocab = Seq(
      "a" -> -3.0, "b" -> -3.5, "c" -> -4.0, "d" -> -5.0,
      "ab" -> -2.0, "bc" -> -2.5, "abc" -> -1.8, "cd" -> -2.2,
      "abcd" -> -4.5, "dd" -> -1.0)
    val vm = vocab.toMap
    val words = Seq("abcd", "abc", "abcabc", "dddd", "dabcd", "cdcd",
      "aaaa", "abcdabcd", "bcd")
    val segs = segment(words, vocab)
    words.zip(segs).foreach { case (w, seg) =>
      assert(seg.mkString("") == w, s"$w: pieces must concatenate back")
      assert(math.abs(scoreOf(seg, vm) - brute(w, vm)) < 1e-9,
        s"$w: viterbi score ${scoreOf(seg, vm)} != brute ${brute(w, vm)} (seg=$seg)")
    }
  }

  test("unknown characters fall back to single-char pieces, never fail") {
    val vocab = Seq("a" -> -1.0, "ab" -> -0.5)
    val segs = segment(Seq("axb", "zzz", "ab"), vocab)
    assert(segs(0) == Seq("a", "x", "b"))
    assert(segs(1) == Seq("z", "z", "z"))
    assert(segs(2) == Seq("ab"))
  }

  test("supplementary characters segment as whole code points, round-tripping") {
    // an emoji (non-BMP: 2 UTF-16 code units) between known pieces must
    // come back as ONE unk piece — splitting it would emit lone
    // surrogates that are invalid UTF-8 and break piece concatenation
    val vocab = Seq("a" -> -1.0, "ab" -> -0.5)
    val emoji = new String(Character.toChars(0x1F600)) // 😀
    val word = s"ab${emoji}a"
    val segs = segment(Seq(word), vocab)
    assert(segs(0) == Seq("ab", emoji, "a"), segs(0).mkString("|"))
    assert(segs(0).mkString == word, "pieces must concatenate back to the input")
  }

  test("ties break to the longest final piece (deterministic)") {
    // "ab"+"c" and "a"+"bc" tie at -4.0; the DP's ascending-start scan
    // with strict improvement keeps the longer FINAL piece ("bc")
    val vocab = Seq("a" -> -2.0, "b" -> -9.0, "c" -> -2.0,
      "ab" -> -2.0, "bc" -> -2.0)
    assert(segment(Seq("abc"), vocab).head == Seq("a", "bc"))
  }

  test("hard-EM likelihood is non-decreasing across rounds") {
    import spark.implicits._
    // every char also occurs as a standalone word, so no piece ever needs
    // the M-step's coverage floor and the hard-EM monotonicity guarantee
    // holds exactly
    val base = Seq("international", "internet", "interval", "nation",
      "nationalism", "tokenization", "token", "tokens",
      "a", "e", "i", "k", "l", "m", "n", "o", "r", "s", "t", "v", "z")
    val docs = (1 to 30).flatMap(_ => base).map(w => (w, w)).toDF("doc_id", "text")
    val (_, ll) = PipelineQueries.learnUnigramLm(docs,
      vocabSize = 48, seedSize = 96, emIters = 4)
    assert(ll.size == 4)
    ll.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-9, s"likelihood decreased: $ll")
    }
    assert(ll.last > ll.head, s"EM never improved: $ll")
  }

  test("trained vocab: chars covered, probs normalized, table deterministic") {
    import spark.implicits._
    val base = Seq("lowering", "lowered", "lowest", "newest", "widest", "wide")
    val docs = (1 to 20).flatMap(_ => base).map(w => (w, w)).toDF("doc_id", "text")
    def train() = PipelineQueries.learnUnigramLm(docs,
      vocabSize = 32, seedSize = 64, emIters = 3)._1
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val t1 = train()
    assert(t1 == train(), "two identical trains must emit identical tables")
    val pieces = t1.map(_._2).toSet
    val uniqChars: Set[Char] = base.mkString.toSet
    for (c <- uniqChars)
      assert(pieces.contains(c.toString), s"single char $c missing from vocab")
    assert(t1.size <= 32)
    // probabilities sum to ~1 (logp rounded to 6dp in the table)
    val mass = t1.map(r => math.exp(r._3)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"prob mass $mass")
    // ranks are 1..n in logp-descending order
    assert(t1.map(_._1) == (1 to t1.size))
    assert(t1.map(_._3).sliding(2).forall { case Seq(a, b) => a >= b })
  }

  test("q129 fertility equals an exact driver recompute") {
    val dir = SparkSuite.sf0001
    val vocab = PipelineQueries.q128UnigramLm(spark, dir)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    val vm = vocab.toMap
    val maxLen = vocab.map(_._1.length).max
    def encode(s: String): Seq[String] = { // the kernel's exact DP
      val n = s.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
      val back = new Array[Int](n + 1)
      for (i <- 1 to n; j <- math.max(0, i - maxLen) until i
           if best(j) != Double.NegativeInfinity) {
        val p = s.substring(j, i)
        val lp = vm.getOrElse(p,
          if (i - j == 1) TextKernels.UnkCharLogp else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
          best(i) = best(j) + lp; back(i) = j
        }
      }
      var e = n; var out = List.empty[String]
      while (e > 0) { out = s.substring(back(e), e) :: out; e = back(e) }
      out
    }
    val words = Tables.load(spark, dir, "documents")
      .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = words.groupBy(_._1).map { case (lang, ws) =>
      val toks = ws.map { case (_, w) => encode(w).size.toLong }.sum
      val bytes = ws.map(_._2.length.toLong).sum
      (lang, ws.length.toLong, r4(toks.toDouble / ws.length), r4(bytes.toDouble / toks))
    }.toSet
    val got = PipelineQueries.q129UnigramFertility(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == expect)
  }
}
