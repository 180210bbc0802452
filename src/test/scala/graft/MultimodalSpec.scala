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
    assert(blobs.map(b => MediaKernels.perceptualHash(b)) ==
      blobs.map(b => MediaKernels.perceptualHash(b)))
    // locality: a 4-bit payload perturbation moves few block means →
    // only median-straddling DCT coefficients can flip
    blobs.zipWithIndex.foreach { case (b, i) =>
      val mutated = MediaKernels.mutatePayload(b, seed = 1000L + i, nFlips = 4)
      val d = ham(MediaKernels.perceptualHash(b), MediaKernels.perceptualHash(mutated))
      assert(d <= 4, s"blob $i drifted $d bits under a tiny edit")
    }
    // separation: unrelated blobs sit near the 32-bit expectation
    val hs = blobs.map(b => MediaKernels.perceptualHash(b))
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

  test("phashPairs star mode: a viral image cluster emits O(m) edges and resolves whole") {
    // the media twin of the text mega-cluster: ONE image re-uploaded m
    // times — byte-identical payloads → identical pHash → every band
    // bucket shared, where the all-pairs join emits Θ(m²) candidates.
    // Star mode must emit exactly m-1 edges (each member paired with
    // the bucket minimum at hamming 0 — the loss-free case the
    // phashPairs scaladoc argues) and the cluster must resolve WHOLE.
    val m = 1000
    val media = spark.range(m).select(col("id").as("doc_id"),
      mm.synthesize_media(lit(0L), lit(0), lit(2048)).as("bytes"))
    val star = mm.phashPairs(media, "doc_id", "bytes", 4, star = true)
    val edges = star.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(edges.length == m - 1, s"star edges ${edges.length}, want ${m - 1}")
    assert(edges.forall { case (a, _, d) => a == 0L && d == 0 },
      "every star edge anchors at the bucket min (doc 0) at hamming 0")
    assert(edges.map(_._2).toSet == (1L until m.toLong).toSet)
    val comps = graft.operators.DedupOps
      .connectedComponents(star.select("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == m && comps.forall(_._2 == 0L),
      "the viral cluster must resolve to ONE component")
    // the all-pairs form on the same corpus pays the full clique
    val allPairs = mm.phashPairs(media, "doc_id", "bytes", 4, star = false)
      .count()
    assert(allPairs == m.toLong * (m - 1) / 2)
  }

  /** A real PNG, generated through the JDK encoder: a deterministic
    * gradient-with-a-box image, optionally noise-perturbed. */
  private def realPng(w: Int, h: Int, noiseSeed: Long = 0L): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var st = noiseSeed
    for (x <- 0 until w; y <- 0 until h) {
      val noise = if (noiseSeed == 0L) 0
      else {
        st = st * 6364136223846793005L + 1442695040888963407L
        ((st >>> 60) & 0x3).toInt // tiny per-pixel perturbation
      }
      val base = (x * 255 / w + y * 255 / h) / 2 + noise
      val inBox = x > w / 4 && x < w / 2 && y > h / 4 && y < h / 2
      val v = math.min(255, if (inBox) 255 - base else base)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG decodes, resizes, and hashes through the SAME plan as stub blobs") {
    import spark.implicits._
    // real codec path: decode_meta reads true dimensions via javax.imageio
    val png = realPng(96, 64)
    val df = Seq((1L, png)).toDF("media_id", "bytes")
      .select(col("media_id"), mm.decode_meta(col("bytes")).as("meta"),
        mm.resize_media(col("bytes"), lit(32), lit(24)).as("small"))
    val r = df.collect()(0)
    val meta = r.getStruct(1)
    assert(meta.getString(0) == "image")
    assert(meta.getInt(1) == 96 && meta.getInt(2) == 64)
    // the resized bytes are THEMSELVES a decodable PNG at the new dims
    val m2 = MediaKernels.decodeMeta(r.getAs[Array[Byte]]("small"))
    assert(m2.width == 32 && m2.height == 24)
    // and the stub path is untouched: a GMM1 blob through the same
    // expressions still reads its header
    val stub = Seq((2L, MediaKernels.synthesize(7L, 0, 512))).toDF("media_id", "bytes")
      .select(mm.decode_meta(col("bytes")).as("meta")).collect()(0).getStruct(0)
    assert(stub.getString(0) == "image" && stub.getInt(1) > 0)
  }

  test("real-image perceptual hash: stable under pixel noise, far from a different image") {
    val a = MediaKernels.perceptualHash(realPng(128, 128))
    val aNoisy = MediaKernels.perceptualHash(realPng(128, 128, noiseSeed = 99L))
    val aSmall = MediaKernels.perceptualHash( // same image re-scaled
      MediaKernels.resize(realPng(128, 128), 64, 64))
    val b = MediaKernels.perceptualHash {
      // genuinely different structure: invert the gradient direction
      val img = new java.awt.image.BufferedImage(128, 128,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 128; y <- 0 until 128) {
        val v = 255 - ((x + y) * 255 / 256) / 2
        img.setRGB(x, y, if ((x / 16 + y / 16) % 2 == 0) v else 255 - v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, aNoisy) <= 4, s"noise moved the hash ${ham(a, aNoisy)} bits")
    assert(ham(a, aSmall) <= 4, s"rescale moved the hash ${ham(a, aSmall)} bits")
    assert(ham(a, b) >= 16, s"unrelated images only ${ham(a, b)} bits apart")
  }

  /** A real RIFF/WAVE blob through the JDK encoder (javax.sound.sampled):
    * 16-bit mono PCM of a sine tone, optionally noise-perturbed. */
  private def realWav(hz: Double, seconds: Double, sampleRate: Int = 16000,
      noiseSeed: Long = 0L): Array[Byte] = {
    val n = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](n * 2)
    var st = noiseSeed
    for (i <- 0 until n) {
      val noise = if (noiseSeed == 0L) 0.0
      else {
        st = st * 6364136223846793005L + 1442695040888963407L
        ((st >>> 60) & 0x3).toDouble * 8.0 // tiny per-sample perturbation
      }
      val v = (math.sin(2 * math.Pi * hz * i / sampleRate) * 12000 + noise).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV decodes, frame-samples, and embeds through the SAME plan as stub blobs") {
    import spark.implicits._
    val wav = realWav(440.0, 0.5) // 8000 samples → 16000 PCM bytes
    val df = Seq((1L, wav)).toDF("media_id", "bytes")
      .select(col("media_id"), mm.decode_meta(col("bytes")).as("meta"),
        mm.frame_sample(col("bytes"), lit(320), lit(2)).as("frames"),
        mm.media_embed(col("bytes"), 16).as("emb"))
    val r = df.collect()(0)
    val meta = r.getStruct(1)
    // real codec path: javax.sound.sampled reads true format + duration
    assert(meta.getString(0) == "audio")
    assert(meta.getInt(3) == 16000)
    assert(meta.getLong(4) == 500L, s"duration ${meta.getLong(4)}")
    // frame sampling runs over DECODED PCM: 16000 bytes / 320-byte
    // frames = 50, every 2nd = 25
    assert(r.getSeq[Array[Byte]](2).length == 25)
    assert(r.getSeq[Float](3).length == 16)
    // and the stub path is untouched through the same expressions
    val stub = Seq((2L, MediaKernels.synthesize(8L, 1, 512))).toDF("media_id", "bytes")
      .select(mm.decode_meta(col("bytes")).as("meta")).collect()(0).getStruct(0)
    assert(stub.getString(0) == "audio" && stub.getInt(3) >= 16000)
  }

  test("real-audio perceptual hash: stable under sample noise, far from a different tone") {
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val a = MediaKernels.perceptualHash(realWav(440.0, 0.5))
    val aNoisy = MediaKernels.perceptualHash(realWav(440.0, 0.5, noiseSeed = 99L))
    val b = MediaKernels.perceptualHash {
      // genuinely different structure: higher tone + square-ish envelope
      val base = realWav(1733.0, 0.5)
      base
    }
    assert(a == MediaKernels.perceptualHash(realWav(440.0, 0.5)), "not deterministic")
    assert(ham(a, aNoisy) <= 6, s"noise moved the audio hash ${ham(a, aNoisy)} bits")
    assert(ham(a, b) >= 16, s"different tones only ${ham(a, b)} bits apart")
  }

  /** One JPEG frame: the realPng gradient+box scene with the box
    * drifting by `t` (a plausible "moving object"), optionally
    * noise-perturbed, encoded through the JDK's JPEG writer. */
  private def jpegFrame(w: Int, h: Int, t: Int, noiseSeed: Long = 0L,
      invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var st = noiseSeed
    for (x <- 0 until w; y <- 0 until h) {
      val noise = if (noiseSeed == 0L) 0
      else {
        st = st * 6364136223846793005L + 1442695040888963407L
        ((st >>> 60) & 0x3).toInt
      }
      val base = (x * 255 / w + y * 255 / h) / 2 + noise
      val bx = (w / 4 + t) % w
      val inBox = x > bx && x < bx + w / 4 && y > h / 4 && y < h / 2
      val v0 = math.min(255, if (inBox) 255 - base else base)
      val v = if (invert) 255 - v0 else v0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A real MJPEG-in-AVI blob: minimal RIFF container (hdrl{avih,
    * strl{strh,strf}} + movi{00dc…}) around JDK-encoded JPEG frames —
    * the one video format the bare JVM can produce AND decode. */
  private def realAvi(w: Int, h: Int, nFrames: Int, fps: Int,
      noiseSeed: Long = 0L, invert: Boolean = false): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ u32(data.length.toLong) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("US-ASCII") ++ u32(body.length + 4L) ++
        typ.getBytes("US-ASCII") ++ body
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(0, 1000000 / fps) // dwMicroSecPerFrame
    avih.putInt(16, nFrames)      // dwTotalFrames
    avih.putInt(32, w)            // dwWidth
    avih.putInt(36, h)            // dwHeight
    val frames = (0 until nFrames)
      .map(t => jpegFrame(w, h, t * 4, noiseSeed, invert))
    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", new Array[Byte](56)) ++
        chunk("strf", new Array[Byte](40))))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body
  }

  test("real MJPEG-AVI decodes, frame-samples, and embeds through the SAME plan as stub blobs") {
    import spark.implicits._
    val avi = realAvi(96, 64, nFrames = 6, fps = 10)
    val df = Seq((1L, avi)).toDF("media_id", "bytes")
      .select(col("media_id"), mm.decode_meta(col("bytes")).as("meta"),
        mm.frame_sample(col("bytes"), lit(0), lit(2)).as("frames"),
        mm.media_embed(col("bytes"), 16).as("emb"))
    val r = df.collect()(0)
    val meta = r.getStruct(1)
    // real codec path: the RIFF walk reads true dims/fps/duration
    assert(meta.getString(0) == "video")
    assert(meta.getInt(1) == 96 && meta.getInt(2) == 64)
    assert(meta.getInt(3) == 10, s"fps ${meta.getInt(3)}")
    assert(meta.getLong(4) == 600L, s"duration ${meta.getLong(4)}")
    // frame sampling respects REAL frame boundaries: every 2nd of 6,
    // and each sampled frame is itself a decodable JPEG
    val frames = r.getSeq[Array[Byte]](2)
    assert(frames.length == 3)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 96 && img.getHeight == 64)
    }
    assert(r.getSeq[Float](3).length == 16)
    // and the stub path is untouched through the same expressions
    val stub = Seq((2L, MediaKernels.synthesize(9L, 2, 512))).toDF("media_id", "bytes")
      .select(mm.decode_meta(col("bytes")).as("meta")).collect()(0).getStruct(0)
    assert(stub.getString(0) == "video" && stub.getLong(4) > 0L)
  }

  test("real-video perceptual hash: stable under pixel noise, far from inverted footage") {
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val a = MediaKernels.perceptualHash(realAvi(128, 128, 8, 10))
    val a2 = MediaKernels.perceptualHash(realAvi(128, 128, 8, 10))
    val aNoisy = MediaKernels.perceptualHash(
      realAvi(128, 128, 8, 10, noiseSeed = 99L))
    val b = MediaKernels.perceptualHash(
      realAvi(128, 128, 8, 10, invert = true))
    assert(a == a2, "not deterministic")
    assert(ham(a, aNoisy) <= 6, s"noise moved the video hash ${ham(a, aNoisy)} bits")
    assert(ham(a, b) >= 16, s"inverted footage only ${ham(a, b)} bits apart")
  }

  test("corrupt AVI chunk sizes terminate (no executor hang) and frame-less AVIs hash") {
    // a chunk size of 0xFFFFFFF8 truncated to Int is -8: the naive walk
    // would never advance `off` and wedge the task forever — the reader
    // clamps sizes to the enclosing span and must always terminate
    val good = realAvi(32, 32, 2, 10)
    val corrupt = good.clone()
    // find the first '00dc' chunk and poison its size field
    val idx = (0 until corrupt.length - 4).find(i =>
      corrupt(i) == '0' && corrupt(i + 1) == '0' &&
        corrupt(i + 2) == 'd' && corrupt(i + 3) == 'c').get
    corrupt(idx + 4) = 0xf8.toByte
    corrupt(idx + 5) = 0xff.toByte
    corrupt(idx + 6) = 0xff.toByte
    corrupt(idx + 7) = 0xff.toByte
    val m = MediaKernels.decodeMeta(corrupt) // must return, not hang
    assert(m.kind == "video")
    // the poisoned frame degrades (clamped to rest-of-span) but the
    // kernels stay total: sampling and hashing return rather than throw
    assert(MediaKernels.frameSample(corrupt, 0, 1) != null)

    // an AVI with zero video frames is media decodeMeta accepts, so the
    // content hash must not kill the task: all such blobs share the
    // deterministic zero-plane sentinel
    def u32b(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(0, 100000).putInt(16, 0).putInt(32, 16).putInt(36, 16)
    val hdrl = "LIST".getBytes ++ u32b(4 + 8 + 56) ++ "hdrl".getBytes ++
      "avih".getBytes ++ u32b(56) ++ avih.array()
    val movi = "LIST".getBytes ++ u32b(4) ++ "movi".getBytes
    val body = "AVI ".getBytes ++ hdrl ++ movi
    val empty = "RIFF".getBytes ++ u32b(body.length.toLong) ++ body
    assert(MediaKernels.decodeMeta(empty).kind == "video")
    val h1 = MediaKernels.perceptualHash(empty)
    assert(h1 == MediaKernels.perceptualHash(empty), "sentinel not stable")
    assert(MediaKernels.frameSample(empty, 0, 1).isEmpty)

    // adversarial avih arithmetic: both unsigned-32 fields near 2^32
    // make total*usPerFrame overflow Long — the clamp must keep the
    // derived duration non-negative (the RIFF walker was hardened
    // against size fields; the avih fields get the same discipline)
    val evil = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.putInt(0, 0xfffffff0) // dwMicroSecPerFrame ≈ 2^32
    evil.putInt(16, 0xfffffff0) // dwTotalFrames ≈ 2^32
    evil.putInt(32, 16).putInt(36, 16)
    val evilHdrl = "LIST".getBytes ++ u32b(4 + 8 + 56) ++ "hdrl".getBytes ++
      "avih".getBytes ++ u32b(56) ++ evil.array()
    val evilBody = "AVI ".getBytes ++ evilHdrl ++ movi
    val evilAvi = "RIFF".getBytes ++ u32b(evilBody.length.toLong) ++ evilBody
    val em = MediaKernels.decodeMeta(evilAvi)
    assert(em.kind == "video")
    assert(em.durationMs >= 0L,
      s"adversarial avih fields overflowed to duration ${em.durationMs}")
  }
}
