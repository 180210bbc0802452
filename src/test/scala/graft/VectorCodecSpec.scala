package graft

import graft.functions.VectorKernels._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Codec parity cases from FIXTURES.md §B1 (reference quantization.go). */
class VectorCodecSpec extends AnyFunSuite {

  /** Deterministic property sampling (no scalatest-scalacheck bridge in
    * the offline cache): draw n samples from gen with a fixed seed. */
  private def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  test("zero-seeded range always includes 0") {
    assert(zeroSeededRange(Array(1f, 2f)) == (0f, 2f))
    assert(zeroSeededRange(Array(-1f, -2f)) == (-2f, 0f))
    assert(zeroSeededRange(Array(-0.25f, 1f)) == (-0.25f, 1f))
    assert(zeroSeededRange(Array.empty[Float]) == (0f, 0f))
  }

  test("golden byte layout: [f32 min LE][f32 max LE][codes]") {
    val q = quantize(Array(0.5f, -0.25f, 1.0f))
    assert(q.length == 11)
    // min = -0.25f → 0xBE800000 LE
    assert(q.slice(0, 4).toSeq == Seq(0x00, 0x00, 0x80, 0xBE).map(_.toByte))
    // max = 1.0f → 0x3F800000 LE
    assert(q.slice(4, 8).toSeq == Seq(0x00, 0x00, 0x80, 0x3F).map(_.toByte))
    // codes: (0.5+0.25)/1.25*255=153 ; 0 ; 255
    assert(q.slice(8, 11).map(_ & 0xff).toSeq == Seq(153, 0, 255))
  }

  test("all-positive vector still spans from 0 (zero-seeded min)") {
    val q = quantize(Array(1f, 2f))
    // (1-0)/2*255 = 127.5 → truncates to 127 (Go uint8() conversion)
    assert(q.slice(8, 10).map(_ & 0xff).toSeq == Seq(127, 255))
  }

  test("constant zero vector is NaN-safe (codes 0, round-trips to 0)") {
    val q = quantize(Array(0f, 0f, 0f))
    assert(q.drop(8).forall(_ == 0))
    assert(dequantize(q).toSeq == Seq(0f, 0f, 0f))
  }

  test("dim-1 and dim-512 round trip within one quantization step") {
    for (dim <- Seq(1, 512)) {
      val rnd = new scala.util.Random(42)
      val v = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val (mn, mx) = zeroSeededRange(v)
      val step = (mx - mn) / 255.0f
      val back = dequantize(quantize(v))
      v.zip(back).foreach { case (x, y) =>
        assert(math.abs(x - y) <= step + 1e-6, s"dim=$dim err=${math.abs(x - y)}")
      }
    }
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0f, 100.0f)).map(_.toArray))

  test("property: round-trip error bounded by one step") {
    forAllN(vecGen) { v =>
      val (mn, mx) = zeroSeededRange(v)
      val step = (mx - mn) / 255.0f
      dequantize(quantize(v)).zip(v).foreach { case (y, x) =>
        assert(math.abs(x - y) <= step + 1e-4f)
      }
    }
  }

  test("property: cosine is symmetric and in [-1, 1]") {
    forAllN(vecGen.flatMap(a => vecGen.map(b => (a, b)))) { case (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val ab = cosine(a, b)
      val ba = cosine(b, a)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("cosine: self-similarity 1, orthogonal 0, scale-invariant, zero-safe") {
    assert(math.abs(cosine(Array(1f, 2f, 3f), Array(1f, 2f, 3f)) - 1.0) < 1e-12)
    assert(cosine(Array(1f, 0f), Array(0f, 1f)) == 0.0)
    assert(math.abs(cosine(Array(1f, 2f), Array(2f, 4f)) - 1.0) < 1e-12)
    assert(cosine(Array(0f, 0f), Array(1f, 1f)) == 0.0)
  }

  test("cosineQ is bit-identical to cosine over dequantized values") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val dim = 1 + rnd.nextInt(128)
      val a = Array.fill(dim)(rnd.nextFloat() * 200 - 100)
      val b = Array.fill(dim)(rnd.nextFloat() * 200 - 100)
      val qa = quantize(a)
      val qb = quantize(b)
      // the fused kernel decodes through the same float32 expression as
      // dequantize, so fused and unfused paths agree exactly
      val expected = cosine(dequantize(qa), dequantize(qb))
      assert(cosineQ(qa, qb) == expected)
    }
  }

  test("noop embedder: deterministic, correct shape and header") {
    val e1 = noopEmbed("hello", 512)
    val e2 = noopEmbed("hello", 512)
    val e3 = noopEmbed("world", 512)
    assert(e1.toSeq == e2.toSeq)
    assert(e1.toSeq != e3.toSeq)
    assert(e1.length == 520)
    assert(readFloatLE(e1, 0) == -1.0f && readFloatLE(e1, 4) == 1.0f)
  }

  test("l2Normalize: unit norm, zero vector stays zero") {
    val v = l2Normalize(Array(3f, 4f))
    assert(math.abs(v(0) - 0.6f) < 1e-6 && math.abs(v(1) - 0.8f) < 1e-6)
    assert(l2Normalize(Array(0f, 0f)).toSeq == Seq(0f, 0f))
  }
}
