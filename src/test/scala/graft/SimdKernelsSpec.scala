package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorKernels

/** SIMD kernels must agree with the scalar f64 kernels within float-
  * accumulation drift, across lane-remainder lengths and edge cases. */
class SimdKernelsSpec extends AnyFunSuite {

  test("SIMD kernel is active in this JVM (module wired through sbt)") {
    assert(VectorKernels.simdAvailable,
      "jdk.incubator.vector missing from fork options?")
  }

  test("cosineFast matches scalar cosine within 1e-5 across shapes") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(1, 3, 7, 8, 15, 16, 17, 63, 64, 65, 512, 1000)) {
      val a = Array.fill(len)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(len)(rnd.nextFloat() * 2 - 1)
      val fast = VectorKernels.cosineFast(a, b)
      val ref = VectorKernels.cosine(a, b)
      assert(math.abs(fast - ref) < 1e-5, s"len=$len: $fast vs $ref")
    }
  }

  test("cosineFast edge cases: zero vector, self-similarity, length mismatch") {
    val z = Array.fill(64)(0f)
    val v = Array.tabulate(64)(i => (i + 1).toFloat)
    assert(VectorKernels.cosineFast(z, v) == 0.0)
    assert(math.abs(VectorKernels.cosineFast(v, v) - 1.0) < 1e-6)
    // mismatched lengths use the common prefix, like the scalar kernel
    val w = Array.tabulate(70)(i => (i + 1).toFloat)
    assert(math.abs(
      VectorKernels.cosineFast(v, w) - VectorKernels.cosine(v, w)) < 1e-5)
  }

  test("dotFast matches scalar dot within relative 1e-5") {
    val rnd = new scala.util.Random(11)
    // sweep the unrolled kernel's boundaries: inside one vector width,
    // at/around 1x and 2x widths (the unroll-2 stride), and odd tails
    for (len <- Seq(1, 5, 15, 16, 17, 31, 32, 33, 47, 64, 65, 512, 1000)) {
      val a = Array.fill(len)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(len)(rnd.nextFloat() * 2 - 1)
      val fast = VectorKernels.dotFast(a, b)
      val ref = VectorKernels.dotUnit(a, b)
      assert(math.abs(fast - ref) <= 1e-5 * math.max(1.0, math.abs(ref)),
        s"len=$len: $fast vs $ref")
    }
  }
}
