package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextKernels, VectorKernels}

/** Property-based invariants for the kernels (SURVEY §5.2), driven by a
  * seeded generator (deterministic across runs). */
class PropertySpec extends AnyFunSuite {

  private val N = 200
  private def withRnd(test: scala.util.Random => Unit): Unit =
    test(new scala.util.Random(42))

  private def vec(rnd: scala.util.Random): Array[Float] =
    Array.fill(1 + rnd.nextInt(128))(rnd.nextFloat() * 200 - 100)

  test("cosine is symmetric, bounded, and 1 on self") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val a = vec(rnd)
        val b0 = vec(rnd)
        val n = math.min(a.length, b0.length)
        val (x, y) = (a.take(n), b0.take(n))
        val s = VectorKernels.cosine(x, y)
        assert(s >= -1.0000001 && s <= 1.0000001)
        assert(math.abs(s - VectorKernels.cosine(y, x)) < 1e-12)
        if (x.exists(_ != 0f))
          assert(math.abs(VectorKernels.cosine(x, x) - 1.0) < 1e-9)
      }
    }
  }

  test("quantization round-trip error is bounded by range/255") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val v = vec(rnd)
        val deq = VectorKernels.dequantize(VectorKernels.quantize(v))
        val (mn, mx) = VectorKernels.zeroSeededRange(v)
        val bound = (mx - mn).toDouble / 255.0 + 1e-6
        v.zip(deq).foreach { case (orig, back) =>
          assert(math.abs(orig - back) <= bound, s"err ${math.abs(orig - back)} > $bound")
        }
      }
    }
  }

  test("quantize codes are monotone in the input value") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val v = vec(rnd)
        val codes = VectorKernels.quantize(v).drop(8).map(_ & 0xff)
        v.indices.sortBy(v).sliding(2).foreach {
          case Seq(i, j) => assert(codes(i) <= codes(j))
          case _ =>
        }
      }
    }
  }

  test("l2Normalize yields unit norm (or zero) and preserves direction") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val v = vec(rnd)
        val nv = VectorKernels.l2Normalize(v)
        val norm = math.sqrt(nv.map(x => x.toDouble * x).sum)
        if (v.exists(_ != 0f)) {
          assert(math.abs(norm - 1.0) < 1e-3)
          assert(VectorKernels.cosine(v, nv) > 0.9999)
        } else assert(norm == 0.0)
      }
    }
  }

  test("hammingHex agrees with bit-counting longs") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val a = f"${rnd.nextLong()}%016x"
        val b = f"${rnd.nextLong()}%016x"
        val la = java.lang.Long.parseUnsignedLong(a, 16)
        val lb = java.lang.Long.parseUnsignedLong(b, 16)
        assert(TextKernels.hammingHex(a, b) == java.lang.Long.bitCount(la ^ lb))
      }
    }
  }

  test("jaccard is symmetric, bounded, and 1 on self") {
    withRnd { rnd =>
      val words = Array("alpha", "beta", "gamma", "delta", "eps")
      (1 to N).foreach { _ =>
        val a = Array.fill(rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
        val b = Array.fill(rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
        val j = TextKernels.jaccard(a, b, 3)
        assert(j >= 0.0 && j <= 1.0)
        assert(TextKernels.jaccard(b, a, 3) == j)
        assert(TextKernels.jaccard(a, a, 3) == 1.0)
      }
    }
  }

  test("minhash entries only decrease when text grows") {
    withRnd { rnd =>
      val words = Array("w1", "w2", "w3", "w4", "w5", "w6")
      (1 to N).foreach { _ =>
        val t = Array.fill(10)(words(rnd.nextInt(words.length))).mkString(" ")
        val sig = TextKernels.minhash(t, 3, 8)
        assert(sig.length == 8)
        val sig2 = TextKernels.minhash(t + " extra words appended here", 3, 8)
        sig.zip(sig2).foreach { case (a, b) => assert(b <= a || a == "z") }
      }
    }
  }

  test("split chunker loses no words and keeps them in order") {
    withRnd { rnd =>
      val parts = Array("aa", "bb", "cc\ndd", "ee ff")
      (1 to N).foreach { _ =>
        val t = Array.fill(40)(parts(rnd.nextInt(parts.length))).mkString(" ")
        val chunks = TextKernels.split("p:", t, 64)
        val joined = chunks.map(_.stripPrefix("p:")).mkString(" ")
        val wordsIn = TextKernels.fields(t).toSeq
        val wordsOut = TextKernels.fields(joined).toSeq
        assert(wordsOut.containsSlice(wordsIn), s"lost words in: $t")
      }
    }
  }

  test("simhash is order-invariant and zero-distance on self") {
    withRnd { rnd =>
      val words = Array("red", "green", "blue", "cyan", "teal", "onyx")
      (1 to N).foreach { _ =>
        val toks = Array.fill(12)(words(rnd.nextInt(words.length)))
        val a = toks.mkString(" ")
        val b = rnd.shuffle(toks.toSeq).mkString(" ")
        val sa = TextKernels.simhashMd5Hex(a)
        assert(TextKernels.hammingHex(sa, TextKernels.simhashMd5Hex(a)) == 0)
        // bag-of-words property: token order does not change the signature
        assert(sa == TextKernels.simhashMd5Hex(b))
      }
    }
  }

  test("near-identical texts have near signatures; unrelated texts don't collide") {
    val base = Array.tabulate(60)(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val unrelated = Array.tabulate(60)(i => s"other$i").mkString(" ")
    val h = TextKernels.hammingHex(
      TextKernels.simhashMd5Hex(base), TextKernels.simhashMd5Hex(nearDup))
    val hFar = TextKernels.hammingHex(
      TextKernels.simhashMd5Hex(base), TextKernels.simhashMd5Hex(unrelated))
    assert(h < hFar, s"near $h !< far $hFar")
    assert(h <= 8, s"near-dup hamming $h")
  }

  test("shingle count equals max(tokens - n + 1, min(tokens, 1))") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val words = Array.fill(rnd.nextInt(12))("w" + rnd.nextInt(9))
        val text = words.mkString(" ")
        val sh = TextKernels.shingles(text, 3)
        val expect = if (words.isEmpty) 0
          else if (words.length < 3) 1 else words.length - 2
        assert(sh.length == expect, s"'$text'")
        // every shingle is made of input tokens in order
        sh.foreach(s => assert(text.toLowerCase.contains(s.split(" ").head)))
      }
    }
  }

  test("lshBands emits exactly `bands` prefixed buckets per signature") {
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val sig = Array.fill(16)(rnd.nextInt(1000).toString)
        val bands = TextKernels.lshBands(sig, 4)
        assert(bands.length == 4)
        assert(bands.map(_.takeWhile(_ != ':')).toSeq == Seq("0", "1", "2", "3"))
        // bucket id depends on the band content: changing one sig entry
        // changes exactly the band containing it
        val sig2 = sig.clone(); sig2(5) = sig2(5) + "x"
        val bands2 = TextKernels.lshBands(sig2, 4)
        assert(bands.zip(bands2).count { case (a, b) => a != b } == 1)
      }
    }
  }

  test("quality score stays in [0,1]; langId stays in its label set") {
    val labels = Set("en", "de", "fr", "es", "zh", "und")
    withRnd { rnd =>
      (1 to N).foreach { _ =>
        val text = Array.fill(rnd.nextInt(40))(
          ("abcdefghijklmnopqrstuvwxyzäöüéàç .,!?123"(rnd.nextInt(40)))).mkString
        val q = TextKernels.qualityScore(text)
        assert(q >= 0.0 && q <= 1.0, s"'$text' -> $q")
        assert(labels.contains(TextKernels.langId(text)), s"'$text'")
      }
    }
  }

  test("top-k is a prefix of the full sort (engine invariant)") {
    withRnd { rnd =>
      (1 to 20).foreach { _ =>
        val sims = Array.fill(100)(rnd.nextInt(50)) // many ties
        val ids = sims.indices.toArray
        val full = ids.sortBy(i => (-sims(i), i))
        val topk = ids.sortBy(i => (-sims(i), i)).take(10)
        assert(full.take(10).toSeq == topk.toSeq)
      }
    }
  }
}
