package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Embedder, HttpProvider, NoopProvider, TextKernels, VectorKernels, gf}

/** M8 embed hand-off (batched mapPartitions provider calls), the HTTP
  * provider against a local stub server, and F10 chat prompt assembly. */
class EmbedderSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Ollama-shaped stub: POST /api/embed returns one deterministic
    * vector per input text ([len, len+1, …]); optionally always fails.
    * Counts requests and records the last JSON body seen. */
  private class StubServer(dim: Int, fail: Boolean = false) {
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var lastBody: String = ""
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/embed", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      lastBody = body
      if (fail) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val texts = m.readTree(body).get("input")
        val out = m.createObjectNode()
        val embs = out.putArray("embeddings")
        (0 until texts.size()).foreach { i =>
          val len = texts.get(i).asText().length
          val v = embs.addArray()
          (0 until dim).foreach(j => v.add((len + j).toFloat))
        }
        val bytes = m.writeValueAsBytes(out)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("HttpProvider posts one batch, parses and quantizes the response") {
    val stub = new StubServer(dim = 4)
    try {
      val p = HttpProvider(Seq(stub.url), "test-model", dim = 4)
      val got = p.embedBatch(Seq("ab", "defgh"))
      assert(stub.hits.get() == 1, "one batch = ONE request")
      assert(stub.lastBody.contains("\"model\":\"test-model\""))
      assert(stub.lastBody.contains("\"input\":[\"ab\",\"defgh\"]"))
      // wire format: quantized [f32 min][f32 max][codes]; round-trip ≈ source
      val a = VectorKernels.dequantize(got(0))
      val b = VectorKernels.dequantize(got(1))
      assert(a.length == 4 && b.length == 4)
      a.zipWithIndex.foreach { case (x, j) => assert(math.abs(x - (2 + j)) < 0.05) }
      b.zipWithIndex.foreach { case (x, j) => assert(math.abs(x - (5 + j)) < 0.05) }
    } finally stub.stop()
  }

  test("HttpProvider rotates across endpoints and retries past a dead one") {
    val s1 = new StubServer(dim = 2)
    val s2 = new StubServer(dim = 2)
    val dead = new StubServer(dim = 2, fail = true)
    try {
      // healthy pool: sequential batches round-robin by least-total-served
      val p = HttpProvider(Seq(s1.url, s2.url), "m", dim = 2)
      (1 to 4).foreach(i => p.embedBatch(Seq(s"text $i")))
      assert(s1.hits.get() + s2.hits.get() == 4)
      assert(s1.hits.get() >= 1 && s2.hits.get() >= 1,
        s"rotation should spread load (${s1.hits.get()}/${s2.hits.get()})")
      // dead endpoint: request falls through to the healthy one, and the
      // failure surfaces in neither results nor ordering state
      val h1 = s1.hits.get(); val h2 = s2.hits.get()
      val pd = HttpProvider(Seq(dead.url, s1.url, s2.url), "m", dim = 2,
        backoffMs = 1)
      val got = pd.embedBatch(Seq("x"))
      assert(got.length == 1)
      assert(dead.hits.get() >= 1, "dead endpoint was tried")
      assert(s1.hits.get() + s2.hits.get() == h1 + h2 + 1, "exactly one retry served")
      // all endpoints dead → bounded retries then a clear error
      val allDead = HttpProvider(Seq(dead.url), "m", dim = 2,
        maxRetries = 2, backoffMs = 1)
      val before = dead.hits.get()
      val err = intercept[RuntimeException](allDead.embedBatch(Seq("x")))
      assert(err.getMessage.contains("after 2 sweeps"))
      assert(dead.hits.get() == before + 2, "one try per sweep, then stop")
    } finally { s1.stop(); s2.stop(); dead.stop() }
  }

  test("HttpProvider drives embedColumn end-to-end through mapPartitions") {
    val stub = new StubServer(dim = 3)
    try {
      import spark.implicits._
      val docs = Seq((1L, "aa"), (2L, "bbbb"), (3L, "c")).toDF("doc_id", "text")
      val got = Embedder.embedColumn(docs, "text",
        HttpProvider(Seq(stub.url), "m", dim = 3), batchSize = 2)
        .select("doc_id", "qvec").collect()
        .map(r => r.getLong(0) -> VectorKernels.dequantize(r.getAs[Array[Byte]](1)))
        .toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(math.abs(got(1L)(0) - 2f) < 0.05)
      assert(math.abs(got(2L)(0) - 4f) < 0.05)
      assert(math.abs(got(3L)(0) - 1f) < 0.05)
    } finally stub.stop()
  }

  test("ingestChunks through a provider equals the inline noop path") {
    import graft.streaming.Streams
    import graft.index.IvfIndex
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents").limit(40)
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings")
    val (_, model) = IvfIndex.build(e, "embedding",
      IvfIndex.Params(listSize = 20, sampleSize = 1000))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "chunk_id", "chunk", "qvec", "centroid_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq, r.getInt(4))).toSet
    // NoopProvider is the deterministic twin of the inline expression:
    // routing ingest through the provider seam must not change one row
    val inline = rows(Streams.ingestChunks(docs, model, dim = 64))
    val seam = rows(Streams.ingestChunks(docs, model, dim = 64,
      provider = Some(NoopProvider(64))))
    assert(seam == inline)
    assert(inline.nonEmpty)
  }

  test("ingestChunks drives the HTTP provider against the stub server") {
    import graft.streaming.Streams
    import graft.index.IvfIndex
    val stub = new StubServer(dim = 64)
    try {
      val docs = Tables.load(spark, SparkSuite.sf0001, "documents").limit(10)
      val e = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      val (_, model) = IvfIndex.build(e, "embedding",
        IvfIndex.Params(listSize = 20, sampleSize = 1000))
      val out = Streams.ingestChunks(docs, model, dim = 64,
        provider = Some(HttpProvider(Seq(stub.url), "m", dim = 64))).collect()
      assert(out.nonEmpty)
      assert(stub.hits.get() >= 1, "ingest must reach the embed service")
    } finally stub.stop()
  }

  test("embedColumn matches the noop_embed expression for every row") {
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "text").limit(100)
    val viaBatch = Embedder.embedColumn(docs, "text", NoopProvider(64), batchSize = 7)
      .select(col("doc_id"), col("qvec"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val viaExpr = docs.select(col("doc_id"), gf.noop_embed(col("text"), 64).as("qvec"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(viaBatch.keySet == viaExpr.keySet)
    viaBatch.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(v, viaExpr(id)), s"doc $id")
    }
  }

  test("batch size does not change results") {
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "text").limit(50)
    val a = Embedder.embedColumn(docs, "text", NoopProvider(32), batchSize = 1)
      .select("doc_id", "qvec").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    val b = Embedder.embedColumn(docs, "text", NoopProvider(32), batchSize = 1000)
      .select("doc_id", "qvec").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(a == b)
  }

  test("chat prompt assembly mirrors the reference format") {
    val msgs = TextKernels.chatMessages(
      history = Seq("hi", "hello!", "what's new"),
      documentsJson = Seq("""{"a": "alpha"}""", """{"b": "beta"}"""),
      prefix = "Report", text = "what does it say?")
    assert(msgs.map(_._1) == Seq("user", "assistant", "user", "user"))
    val q = msgs.last._2
    assert(q.startsWith("I have 2 text document that I'd like to use as context " +
      "for my question. Here's the relevant parts:\n\n"))
    assert(q.contains("\"\"\"a: alpha.\"\"\"\n"))
    assert(q.contains("\"\"\"b: beta.\"\"\"\n"))
    assert(q.endsWith("My question is: Report. what does it say?"))
  }

  test("chat prompt with no documents and no prefix") {
    val msgs = TextKernels.chatMessages(Nil, Nil, "", "just asking")
    assert(msgs == Seq(("user", "My question is: just asking")))
  }

  test("embedIncremental embeds ONLY cache misses, byte-identical either way") {
    import spark.implicits._
    EmbedCounter.texts.set(0)
    val dim = 64
    val counting = CountingNoopProvider(dim)
    val empty = Seq.empty[(String, Array[Byte])].toDF("fp", "vec")

    // batch 1: 6 rows over 4 distinct texts — provider sees each
    // distinct text exactly once
    val b1 = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma",
      4L -> "alpha", 5L -> "delta", 6L -> "beta").toDF("id", "text")
    val (out1, cache1) = Embedder.embedIncremental(b1, "text", empty, counting)
    val got1 = out1.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("qvec")).toMap
    assert(got1.size == 6 && EmbedCounter.texts.get() == 4)
    assert(cache1.count() == 4)
    // equality with the plain full-embed path, byte for byte
    val full = Embedder.embedColumn(b1, "text", NoopProvider(dim))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("qvec")).toMap
    got1.foreach { case (id, v) => assert(v.sameElements(full(id)), s"row $id") }

    // batch 2: 3 cached texts + 2 new ones — provider sees ONLY the 2
    val c1 = cache1.localCheckpoint(true)
    EmbedCounter.texts.set(0)
    val b2 = Seq(7L -> "alpha", 8L -> "epsilon", 9L -> "beta",
      10L -> "zeta", 11L -> "gamma").toDF("id", "text")
    val (out2, cache2) = Embedder.embedIncremental(b2, "text", c1, counting)
    val got2 = out2.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("qvec")).toMap
    assert(got2.size == 5 && EmbedCounter.texts.get() == 2,
      s"provider saw ${EmbedCounter.texts.get()} texts")
    assert(cache2.count() == 6)
    val full2 = Embedder.embedColumn(b2, "text", NoopProvider(dim))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("qvec")).toMap
    got2.foreach { case (id, v) => assert(v.sameElements(full2(id)), s"row $id") }
  }
  test("embedWithStore persists the cache across jobs; second run pays only churn") {
    import spark.implicits._
    val dim = 32
    val store = graft.sources.ParquetStore(
      java.nio.file.Files.createTempDirectory("embcache").toString + "/s", "fp", 8)
    EmbedCounter.texts.set(0)
    val b1 = Seq(1L -> "one", 2L -> "two", 3L -> "three").toDF("id", "text")
    val out1 = Embedder.embedWithStore(b1, "text", store, CountingNoopProvider(dim))
    assert(out1.count() == 3 && EmbedCounter.texts.get() == 3)
    assert(store.read(spark).count() == 3)

    EmbedCounter.texts.set(0)
    val b2 = Seq(4L -> "two", 5L -> "four", 6L -> "three").toDF("id", "text")
    val out2 = Embedder.embedWithStore(b2, "text", store, CountingNoopProvider(dim))
    val got = out2.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("qvec")).toMap
    assert(got.size == 3 && EmbedCounter.texts.get() == 1,
      s"provider saw ${EmbedCounter.texts.get()} texts")
    assert(store.read(spark).count() == 4)
    val full = Embedder.embedColumn(b2, "text", NoopProvider(dim))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("qvec")).toMap
    got.foreach { case (id, v) => assert(v.sameElements(full(id)), s"row $id") }
  }
}

/** Executor-side call counter (local-mode shared JVM). */
object EmbedCounter {
  val texts = new java.util.concurrent.atomic.AtomicInteger()
}

final case class CountingNoopProvider(dim: Int)
    extends graft.functions.EmbedProvider {
  def embedBatch(ts: Seq[String]): Seq[Array[Byte]] = {
    EmbedCounter.texts.addAndGet(ts.size)
    NoopProvider(dim).embedBatch(ts)
  }
}
