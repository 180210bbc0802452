package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{mm, MediaKernels}

/** Multimodal binary-column plumbing: header codec, resize/frame-sample
  * stubs, batched partition-local decode, embedding hand-off. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("decode(synthesize) round-trips the typed metadata") {
    (0L until 50L).foreach { id =>
      val b = MediaKernels.synthesize(id, (id % 3).toInt, 1024)
      val m = MediaKernels.decodeMeta(b)
      assert(Seq("image", "audio", "video").contains(m.kind))
      assert(m.width >= 64 && m.height >= 64)
      if (m.kind == "audio") assert(m.sampleRate >= 16000)
      if (m.kind == "image") assert(m.durationMs == 0L)
      // deterministic: same id → same bytes
      assert(java.util.Arrays.equals(b, MediaKernels.synthesize(id, (id % 3).toInt, 1024)))
    }
  }

  test("resize rewrites dimensions and keeps the payload decodeable") {
    val b = MediaKernels.synthesize(7L, 0, 512)
    val r = MediaKernels.resize(b, 224, 224)
    val m = MediaKernels.decodeMeta(r)
    assert(m.width == 224 && m.height == 224)
    assert(r.length == b.length)
  }

  test("frame sampling returns every Nth fixed-width frame") {
    val b = MediaKernels.synthesize(3L, 2, 2048) // 8 frames of 256
    val frames = MediaKernels.frameSample(b, 256, 4)
    assert(frames.length == 2)
    assert(frames.forall(_.length == 256))
    // frame 0 must equal the first 256 payload bytes
    val payload = java.util.Arrays.copyOfRange(b, MediaKernels.HEADER_LEN, b.length)
    assert(java.util.Arrays.equals(frames(0), java.util.Arrays.copyOfRange(payload, 0, 256)))
  }

  test("column functions and batched decode agree") {
    import spark.implicits._
    val df = (0L until 100L).toDF("media_id")
      .withColumn("bytes",
        mm.synthesize_media(col("media_id"), (col("media_id") % 3).cast("int"), lit(1024)))
    val viaUdf = df.select(col("media_id"), mm.decode_meta(col("bytes")).as("meta"))
      .select(col("media_id"), col("meta.kind"), col("meta.width"))
      .collect().map(_.toSeq).toSet
    val viaBatch = mm.decodeMetaBatched(df, "bytes", batchSize = 7)
      .select(col("media_id"), col("meta.kind"), col("meta.width"))
      .collect().map(_.toSeq).toSet
    assert(viaUdf == viaBatch)
  }

  test("media embedding is deterministic with the right shape") {
    val b = MediaKernels.synthesize(11L, 1, 512)
    val e1 = MediaKernels.embed(b, 64)
    val e2 = MediaKernels.embed(b, 64)
    assert(e1.length == 64 && e1.sameElements(e2))
    assert(e1.forall(x => x >= -1.0f && x <= 1.0f))
    // different payload → different embedding
    val other = MediaKernels.embed(MediaKernels.synthesize(12L, 1, 512), 64)
    assert(!e1.sameElements(other))
  }

  test("media embedding near-dup sweep finds exactly the planted duplicates") {
    import spark.implicits._
    // 50 distinct media blobs + 5 planted byte-identical duplicates
    val rows = (0L until 50L).map(i => (i, i)) ++ (0L until 5L).map(i => (100L + i, i))
    val df = rows.toDF("row_id", "media_id")
      .withColumn("bytes",
        mm.synthesize_media(col("media_id"), (col("media_id") % 3).cast("int"), lit(512)))
      .withColumn("emb", mm.media_embed(col("bytes"), 32))
    val pairs = df.as("a")
      .join(df.as("b"), col("a.row_id") < col("b.row_id"))
      .select(col("a.row_id").as("ra"), col("b.row_id").as("rb"),
        graft.functions.gf.cosine_sim(col("a.emb"), col("b.emb")).as("sim"))
      .filter(col("sim") > 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 5L).map(i => (i, 100L + i)).toSet, pairs)
  }

  test("q34 media pipeline aggregates per kind") {
    val rows = PipelineQueries.q34MediaPipeline(spark, SparkSuite.sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(rows.map(_.getLong(1)).sum == 500L)
    // 2048-byte payload, 256-byte frames, every 4th → 2 frames per blob
    rows.foreach(r => assert(r.getLong(3) == r.getLong(1) * 2))
  }

  test("perceptual hash: deterministic, local under small edits, far apart otherwise") {
    // ids spaced 997 apart: synthesize()'s splitmix stream makes blob
    // id+k a k-byte-SHIFTED stream of blob id, and pHash (like the real
    // one) tolerates small translations — adjacent ids land ~8 bits
    // apart BY DESIGN, so "unrelated" needs well-separated ids whose
    // shift exceeds the block grid
    val blobs = (0L until 40L).map(i => MediaKernels.synthesize(i * 997, 0, 2048))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // deterministic
    assert(blobs.map(MediaKernels.perceptualHash) ==
      blobs.map(MediaKernels.perceptualHash))
    // locality: a 4-bit payload perturbation moves few block means →
    // only median-straddling DCT coefficients can flip
    blobs.zipWithIndex.foreach { case (b, i) =>
      val mutated = MediaKernels.mutatePayload(b, seed = 1000L + i, nFlips = 4)
      val d = ham(MediaKernels.perceptualHash(b), MediaKernels.perceptualHash(mutated))
      assert(d <= 4, s"blob $i drifted $d bits under a tiny edit")
    }
    // separation: unrelated blobs sit near the 32-bit expectation
    val hs = blobs.map(MediaKernels.perceptualHash)
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(ham(hs(i), hs(j)) > 10, s"unrelated $i,$j too close")
  }

  test("q101 phash near-dup equals brute-force hamming<=4 and finds the planted copies") {
    val got = PipelineQueries.q101MediaPhash(spark, SparkSuite.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // driver-side brute force over the same synthesis rule
    val blobs = (0L until 500L).map { id =>
      val base = if (id % 10 == 9) id - 1 else id
      val orig = MediaKernels.synthesize(base, 0, 2048)
      id -> (if (id % 10 == 9) MediaKernels.mutatePayload(orig, id, 4) else orig)
    }
    val hs = blobs.map { case (id, b) => id -> MediaKernels.perceptualHash(b) }
    val brute = for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d)
    assert(got.toSet == brute.toSet,
      s"banded ${got.length} vs brute ${brute.length}")
    // every planted (id-1, id) copy pair recovered
    val planted = (0L until 500L).filter(_ % 10 == 9).map(id => (id - 1, id)).toSet
    assert(planted.subsetOf(got.map(p => (p._1, p._2)).toSet))
  }
}
