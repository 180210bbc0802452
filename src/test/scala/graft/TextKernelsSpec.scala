package graft

import graft.functions.TextKernels._
import org.scalatest.funsuite.AnyFunSuite

/** Golden strings derived from the reference's Flatten/Split semantics
  * (server/format.go:17-108) — see FIXTURES.md §B3/B4. */
class TextKernelsSpec extends AnyFunSuite {

  // ---- Flatten ----

  test("flatten scalars") {
    assert(flattenJson("null") == "null.")
    assert(flattenJson("\"hello\"") == "hello.")
    assert(flattenJson("\"hello.\"") == "hello.")
    assert(flattenJson("true") == "true.")
    assert(flattenJson("false") == "false.")
  }

  test("flatten floats use shortest float32 fixed notation") {
    assert(flattenJson("0.1") == "0.1")
    assert(flattenJson("87") == "87")
    assert(flattenJson("-2.5") == "-2.5")
    assert(flattenJson("0") == "0")
  }

  test("formatFloatShortest matches Go strconv.FormatFloat(v,'f',-1,32) goldens") {
    // goldens computed with Go 1.22 strconv
    assert(formatFloatShortest(0.1) == "0.1")
    assert(formatFloatShortest(0.3) == "0.3")
    assert(formatFloatShortest(1.0 / 3.0) == "0.33333334")
    assert(formatFloatShortest(100.0) == "100")
    assert(formatFloatShortest(1e7) == "10000000")
    assert(formatFloatShortest(1e-7) == "0.0000001")
    assert(formatFloatShortest(123456789.0) == "123456790") // f32 rounding
    assert(formatFloatShortest(3.4028235e38) ==
      "340282350000000000000000000000000000000")
    assert(formatFloatShortest(-0.0) == "-0") // Go preserves the sign
    assert(formatFloatShortest(0.0) == "0")
    assert(formatFloatShortest(2.5) == "2.5")
    assert(formatFloatShortest(-1.25e-5) == "-0.0000125")
  }

  test("formatFloatShortest always round-trips to the same float32") {
    val rnd = new scala.util.Random(7)
    (0 until 5000).foreach { _ =>
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN && !f.isInfinite) {
        val s = formatFloatShortest(f.toDouble)
        assert(java.lang.Float.floatToIntBits(java.lang.Float.parseFloat(s)) ==
          java.lang.Float.floatToIntBits(f), s"$f -> $s")
      }
    }
  }

  test("flatten array: one item per line") {
    assert(flattenJson("""[1, "a"]""") == "1\na.")
    assert(flattenJson("""[]""") == "")
  }

  test("flatten map: keys sorted, reference newline placement") {
    // last line of a value gets no newline (format.go:80-84)
    assert(flattenJson("""{"b": 1, "a": "x"}""") == "a: x.b: 1")
    // last key never gets newlines at all
    assert(flattenJson("""{"a": [1, 2]}""") == "a: 1a: 2")
    // non-last key with multi-line value keeps inner newlines
    assert(flattenJson("""{"a": [1, 2], "b": 3}""") == "a: 1\na: 2b: 3")
  }

  test("flatten string cleanup: CR strip, newline collapse, trailing period") {
    assert(flattenJson("\"x\\r\\n\\n\\ny\"") == "x\ny.")
    assert(flattenJson("\"  padded  \"") == "padded.")
  }

  test("nested map") {
    // inner {"y":1} flattens to "y: 1"; outer key prefixes each line
    assert(flattenJson("""{"x": {"y": 1}}""") == "x: y: 1")
  }

  // ---- Split ----

  test("split: single chunk keeps space-join semantics") {
    assert(split("P:", "a b c", 8192).toSeq == Seq("P: a b c"))
  }

  test("split: word budget maxWords=((ctx*9)/10)/4") {
    // ctx=9 → maxWords=2
    assert(split("P:", "a b\nc\nd e f", 9).toSeq ==
      Seq("P: a b", "P: c", "P: d e f"))
  }

  test("split: empty text yields one prefix chunk") {
    assert(split("P:", "", 9).toSeq == Seq("P: "))
  }

  test("split: budget boundary — exactly maxWords does not split") {
    // ctx=9 → maxWords=2; two 1-word sentences fit one chunk
    assert(split("P:", "a\nb", 9).toSeq == Seq("P: a b"))
  }

  // ---- fields / shingles / hashes ----

  test("fields mirrors Go strings.Fields") {
    assert(fields("  a  b\tc\n").toSeq == Seq("a", "b", "c"))
    assert(fields("").isEmpty)
  }

  test("shingles: lowercase word n-grams; short text collapses") {
    assert(shingles("The quick brown fox", 3).toSeq ==
      Seq("the quick brown", "quick brown fox"))
    assert(shingles("one two", 3).toSeq == Seq("one two"))
    assert(shingles("", 3).isEmpty)
  }

  test("minhash: deterministic, k values, permutation-sensitive") {
    val s1 = minhash("the quick brown fox jumps over the lazy dog", 3, 16)
    val s2 = minhash("the quick brown fox jumps over the lazy dog", 3, 16)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == 16)
    assert(s1.distinct.length > 1) // different seeds give different minima
  }

  test("minhash similarity tracks jaccard") {
    val a = "the quick brown fox jumps over the lazy dog and runs away fast today"
    val b = "the quick brown fox jumps over the lazy dog and runs away fast now"
    val c = "completely different words appear in this unrelated sentence about spark"
    val (sa, sb, sc) = (minhash(a, 3, 64), minhash(b, 3, 64), minhash(c, 3, 64))
    def agree(x: Array[String], y: Array[String]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    assert(agree(sa, sb) > 0.5)
    assert(agree(sa, sc) < 0.2)
  }

  test("minhashFast: deterministic, in-bounds, sentinel on empty, tracks jaccard") {
    import graft.functions.TextKernels.minhashFast
    val a = "the quick brown fox jumps over the lazy dog and runs away fast today"
    val b = "the quick brown fox jumps over the lazy dog and runs away fast now"
    val c = "completely different words appear in this unrelated sentence about spark"
    val sa = minhashFast(a, 3, 16)
    assert(sa.toSeq == minhashFast(a, 3, 16).toSeq && sa.length == 16)
    // Kirsch-Mitzenmacher bound: h1 + 15·h2 < 2⁶⁰ + 15·2⁵⁶ < 2⁶¹ — every
    // value positive, no overflow on either engine
    Seq(a, b, c).foreach(t => minhashFast(t, 3, 16).foreach(v =>
      assert(v > 0 && v < (1L << 61))))
    assert(minhashFast("", 3, 16).forall(_ == Long.MaxValue))
    def agree(x: Array[Long], y: Array[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    val (fa, fb, fc) = (minhashFast(a, 3, 64), minhashFast(b, 3, 64), minhashFast(c, 3, 64))
    assert(agree(fa, fb) > 0.5)
    assert(agree(fa, fc) < 0.2)
    // identical texts are ALWAYS candidates: equal shingle sets ⇒ equal
    // signatures ⇒ every band collides (the deterministic LSH guarantee)
    assert(fa.toSeq == minhashFast(a, 3, 64).toSeq)
  }

  test("simhash: near-dup texts land at small hamming distance") {
    val a = simhash64("the quick brown fox jumps over the lazy dog and keeps running through the field")
    val b = simhash64("the quick brown fox jumps over the lazy dog and keeps running through the meadow")
    val c = simhash64("rust go scala spark flink trino duckdb engines compared for throughput benchmarks")
    assert(hammingDist64(a, b) < 16)
    assert(hammingDist64(a, c) > 16)
  }

  test("jaccard: identity, disjoint, empty") {
    assert(jaccard("a b c d", "a b c d", 2) == 1.0)
    assert(jaccard("a b c", "x y z", 2) == 0.0)
    assert(jaccard("", "", 3) == 1.0)
  }

  test("rolling fingerprint is order-sensitive, md5-style dedup is not") {
    assert(rollingFingerprint("a b c") != rollingFingerprint("c b a"))
    assert(rollingFingerprint("a b c") == rollingFingerprint("A B  c"))
  }

  // ---- language id / quality ----

  test("langId on real-language snippets") {
    assert(langId("the cat sat on the mat and it was happy with this") == "en")
    assert(langId("der Hund ist nicht mit der Katze und das ist gut") == "de")
    assert(langId("le chat est dans la maison et il est content pour les vacances") == "fr")
    assert(langId("el perro es grande y la casa es bonita por el sol") == "es")
    assert(langId("机器学习模型在大规模数据集上的训练效果很好") == "zh")
    assert(langId("") == "und")
    assert(langId("xyzzy plugh") == "und")
  }

  test("qualityScore: ordering sanity") {
    val good = "This is a reasonably long paragraph of normal English prose. " * 4
    val bad = "!!! ??? ,,, ;;; ::: !!!"
    assert(qualityScore(good) > qualityScore(bad))
    assert(qualityScore("") == 0.0)
    assert(qualityScore(good) <= 1.0 && qualityScore(bad) >= 0.0)
  }
}
