package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** JVM kernels for the vector codec and cosine similarity.
  *
  * Semantics mirror the reference engine (see SURVEY.md §2.7-2.8):
  *  - Quantized vector layout: `[4B f32 min LE][4B f32 max LE][dim × uint8]`
  *    (reference compute/quantization.go:71-102).
  *  - min/max are zero-seeded — the range always includes 0
  *    (reference compute/quantization.go:182-216).
  *  - Codes truncate (Go `uint8(x)` conversion), NaN (min==max) → 0.
  *  - Cosine: L2-normalize both sides (zero-norm safe), dot in float64
  *    (reference compute/cosine.go:13-125, 138-149).
  *
  * These are static methods so whole-stage codegen can call them directly
  * (see expressions.scala) without boxing through an interpreted UDF.
  */
object VectorKernels {

  /** Zero-seeded min/max of a float vector (reference quantization.go:182-192). */
  def zeroSeededRange(v: Array[Float]): (Float, Float) = {
    var mn = 0.0f
    var mx = 0.0f
    var i = 0
    while (i < v.length) {
      val x = v(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    (mn, mx)
  }

  /** array<float> → binary(dim+8). Reference quantization.go:85-94. */
  def quantize(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](8 + v.length)
    val (mn, mx) = zeroSeededRange(v)
    writeFloatLE(out, 0, mn)
    writeFloatLE(out, 4, mx)
    val range = mx - mn
    var i = 0
    while (i < v.length) {
      var x = v(i)
      if (x < mn) x = mn else if (x > mx) x = mx
      val code =
        if (range == 0.0f) 0 // NaN path: Go uint8(NaN) == 0 on amd64
        else ((x - mn) / range * 255.0f).toInt // Go uint8() truncates
      out(8 + i) = code.toByte
      i += 1
    }
    out
  }

  /** binary(dim+8) → array<float>. Reference quantization.go:118-126. */
  def dequantize(b: Array[Byte]): Array[Float] = {
    val mn = readFloatLE(b, 0)
    val mx = readFloatLE(b, 4)
    val range = mx - mn
    val out = new Array[Float](b.length - 8)
    var i = 0
    while (i < out.length) {
      val code = (b(8 + i) & 0xff).toFloat
      out(i) = mn + code / 255.0f * range
      i += 1
    }
    out
  }

  /** True when the JDK Vector API kernels linked (module present and a
    * probe call succeeded) and `-Dgraft.simd` is not "false". */
  val simdAvailable: Boolean =
    try {
      sys.props.getOrElse("graft.simd", "true").toBoolean &&
        SimdKernels.cosine(Array(1f, 2f, 3f), Array(1f, 2f, 3f)) > 0.99
    } catch { case _: Throwable => false }

  /** Fast cosine: SIMD (Vector API, float-accumulated, ~1e-5 relative
    * drift) when available, else the scalar f64 kernel. For latency-bound
    * paths where small FP drift is fine — centroid probe argmax, micro
    * benches. Oracle-parity paths must call [[cosine]]. */
  def cosineFast(a: Array[Float], b: Array[Float]): Double =
    if (simdAvailable) SimdKernels.cosine(a, b) else cosine(a, b)

  /** Fast dot product — same dispatch/drift contract as [[cosineFast]]. */
  def dotFast(a: Array[Float], b: Array[Float]): Double =
    if (simdAvailable) SimdKernels.dot(a, b) else dotUnit(a, b)

  /** Cosine similarity of two float vectors, computed in float64 with
    * zero-norm safety (reference cosine.go:40-56,138-149). 4-way unrolled:
    * independent accumulator chains break the sequential FP dependency so
    * the CPU pipelines ~4 FMAs in flight (the scalar analogue of the
    * reference's BLAS/AVX path). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var b0 = 0.0; var b1 = 0.0; var b2 = 0.0; var b3 = 0.0
    var i = 0
    val n4 = n - (n % 4)
    while (i < n4) {
      val x0 = a(i).toDouble; val y0 = b(i).toDouble
      val x1 = a(i + 1).toDouble; val y1 = b(i + 1).toDouble
      val x2 = a(i + 2).toDouble; val y2 = b(i + 2).toDouble
      val x3 = a(i + 3).toDouble; val y3 = b(i + 3).toDouble
      d0 += x0 * y0; a0 += x0 * x0; b0 += y0 * y0
      d1 += x1 * y1; a1 += x1 * x1; b1 += y1 * y1
      d2 += x2 * y2; a2 += x2 * x2; b2 += y2 * y2
      d3 += x3 * y3; a3 += x3 * x3; b3 += y3 * y3
      i += 4
    }
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d0 += x * y; a0 += x * x; b0 += y * y
      i += 1
    }
    val dot = (d0 + d1) + (d2 + d3)
    val na = (a0 + a1) + (a2 + a3)
    val nb = (b0 + b1) + (b2 + b3)
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Fused dequantize + cosine over two packed quantized vectors —
    * avoids materializing array<float> in the hot search path. */
  def cosineQ(a: Array[Byte], b: Array[Byte]): Double = {
    // Decode each code through the exact float32 expression dequantize
    // uses (mn + code/255f*range) so the fused path is bit-identical to
    // cosine(dequantize(a), dequantize(b)).
    val amn = readFloatLE(a, 0)
    val arange = readFloatLE(a, 4) - amn
    val bmn = readFloatLE(b, 0)
    val brange = readFloatLE(b, 4) - bmn
    val n = math.min(a.length, b.length) - 8
    // accumulation pattern MUST mirror cosine's 4-way chains exactly
    // (element i -> chain i%4, tail -> chain 0, (c0+c1)+(c2+c3) reduce)
    // so fused and unfused stay bit-identical
    var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var b0 = 0.0; var b1 = 0.0; var b2 = 0.0; var b3 = 0.0
    @inline def xAt(i: Int): Double = (amn + (a(8 + i) & 0xff).toFloat / 255.0f * arange).toDouble
    @inline def yAt(i: Int): Double = (bmn + (b(8 + i) & 0xff).toFloat / 255.0f * brange).toDouble
    var i = 0
    val n4 = n - (n % 4)
    while (i < n4) {
      val x0 = xAt(i); val y0 = yAt(i)
      val x1 = xAt(i + 1); val y1 = yAt(i + 1)
      val x2 = xAt(i + 2); val y2 = yAt(i + 2)
      val x3 = xAt(i + 3); val y3 = yAt(i + 3)
      d0 += x0 * y0; a0 += x0 * x0; b0 += y0 * y0
      d1 += x1 * y1; a1 += x1 * x1; b1 += y1 * y1
      d2 += x2 * y2; a2 += x2 * x2; b2 += y2 * y2
      d3 += x3 * y3; a3 += x3 * x3; b3 += y3 * y3
      i += 4
    }
    while (i < n) {
      val x = xAt(i); val y = yAt(i)
      d0 += x * y; a0 += x * x; b0 += y * y
      i += 1
    }
    val dot = (d0 + d1) + (d2 + d3)
    val na = (a0 + a1) + (a2 + a3)
    val nb = (b0 + b1) + (b2 + b3)
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Dot product of two already-L2-normalized float vectors (gemv row);
    * 4-way unrolled like [[cosine]]. */
  def dotUnit(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    var i = 0
    val n4 = n - (n % 4)
    while (i < n4) {
      d0 += a(i).toDouble * b(i).toDouble
      d1 += a(i + 1).toDouble * b(i + 1).toDouble
      d2 += a(i + 2).toDouble * b(i + 2).toDouble
      d3 += a(i + 3).toDouble * b(i + 3).toDouble
      i += 4
    }
    while (i < n) { d0 += a(i).toDouble * b(i).toDouble; i += 1 }
    (d0 + d1) + (d2 + d3)
  }

  /** L2-normalize (copy), zero-safe (reference cosine.go:138-149). */
  def l2Normalize(v: Array[Float]): Array[Float] = {
    var norm = 0.0
    var i = 0
    while (i < v.length) { norm += v(i).toDouble * v(i).toDouble; i += 1 }
    norm = math.sqrt(norm)
    val out = new Array[Float](v.length)
    if (norm != 0.0) {
      i = 0
      while (i < v.length) { out(i) = (v(i) / norm).toFloat; i += 1 }
    }
    out
  }

  /** Deterministic fake embedding (reference noop/ai.go:47-64): 512-dim
    * quantized vector, header min=-1 max=1, codes from a hash-seeded PRNG
    * over the input text (our variant is text-seeded so it is reproducible,
    * unlike the reference's time-seeded RNG — see SURVEY.md §4.3). */
  def noopEmbed(text: String, dim: Int): Array[Byte] = {
    val out = new Array[Byte](8 + dim)
    writeFloatLE(out, 0, -1.0f)
    writeFloatLE(out, 4, 1.0f)
    // splitmix64 over a stable string hash — deterministic across JVMs
    var state = fnv1a64(text)
    var i = 0
    while (i < dim) {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      out(8 + i) = (z & 0xff).toByte
      i += 1
    }
    out
  }

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  // ---- ArrayData adapters for codegen call sites ----

  def cosineAD(a: ArrayData, b: ArrayData): Double =
    cosine(a.toFloatArray(), b.toFloatArray())

  def quantizeAD(a: ArrayData): Array[Byte] = quantize(a.toFloatArray())

  def dequantizeAD(b: Array[Byte]): ArrayData =
    new GenericArrayData(dequantize(b).map(java.lang.Float.valueOf))

  def l2NormalizeAD(a: ArrayData): ArrayData =
    new GenericArrayData(l2Normalize(a.toFloatArray()).map(java.lang.Float.valueOf))

  // ---- little-endian f32 helpers ----

  def writeFloatLE(dst: Array[Byte], off: Int, f: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(f)
    dst(off) = (bits & 0xff).toByte
    dst(off + 1) = ((bits >>> 8) & 0xff).toByte
    dst(off + 2) = ((bits >>> 16) & 0xff).toByte
    dst(off + 3) = ((bits >>> 24) & 0xff).toByte
  }

  def readFloatLE(src: Array[Byte], off: Int): Float = {
    val bits = (src(off) & 0xff) |
      ((src(off + 1) & 0xff) << 8) |
      ((src(off + 2) & 0xff) << 16) |
      ((src(off + 3) & 0xff) << 24)
    java.lang.Float.intBitsToFloat(bits)
  }
}
