package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{NoopGenerateProvider, OllamaGenerateProvider,
  OpenAiEmbedProvider, OpenAiGenerateProvider, TextKernels, VectorKernels}

/** Generate/chat provider seam (reference ai/ollama/{generate,chat}.go,
  * ai/openai/{embed,chat}.go) against local stub servers, plus the
  * /api/chat lifecycle facade (server/chat.go:109-181). */
class GeneratorSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Stub HTTP server: per-path canned responder with request capture. */
  private class Stub(routes: Map[String, String => (Int, String)]) {
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var lastPath: String = ""
    @volatile var lastBody: String = ""
    @volatile var lastAuth: String = ""
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, respond) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        hits.incrementAndGet()
        lastPath = ex.getRequestURI.getPath
        lastBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val (code, body) = respond(lastBody)
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        if (code != 200 && bytes.isEmpty) { ex.sendResponseHeaders(code, -1) }
        else {
          ex.sendResponseHeaders(code, bytes.length)
          ex.getResponseBody.write(bytes)
        }
        ex.close()
      })
    }
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("NoopGenerateProvider is deterministic, input-sensitive, and bounded") {
    val p = NoopGenerateProvider()
    val a = p.generate("what is a join?")
    assert(a == p.generate("what is a join?"), "same prompt, same reply")
    assert(a != p.generate("what is a scan?"), "different prompt, different reply")
    assert(a.length % 2 == 0 && a.length <= 511 * 2, "hex of <512 bytes")
    assert(a.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
    val c1 = p.chat(Seq("user" -> "hi", "assistant" -> "hello", "user" -> "bye"))
    assert(c1 == p.chat(Seq("user" -> "hi", "assistant" -> "hello", "user" -> "bye")))
    // role/content boundaries matter: the same flattened bytes split
    // differently must not collide
    assert(c1 != p.chat(Seq("user" -> "hi", "assistant" -> "hellouser", "user" -> "bye")))
    // streaming default wraps the blocking call
    assert(p.generateStream("x").mkString == p.generate("x"))
  }

  test("OllamaGenerateProvider generate: body shape and response field") {
    val stub = new Stub(Map("/api/generate" -> { body =>
      val prompt = mapper.readTree(body).get("prompt").asText()
      (200, s"""{"model":"m","response":"echo: $prompt","done":true}""")
    }))
    try {
      val p = OllamaGenerateProvider(Seq(stub.url), "test-gen")
      assert(p.generate("hello world") == "echo: hello world")
      assert(stub.lastPath == "/api/generate")
      val sent = mapper.readTree(stub.lastBody)
      assert(sent.get("model").asText() == "test-gen")
      assert(sent.get("prompt").asText() == "hello world")
      assert(!sent.get("stream").asBoolean(true), "blocking call posts stream:false")
    } finally stub.stop()
  }

  test("OllamaGenerateProvider chat: messages round-trip, reply from message.content") {
    val stub = new Stub(Map("/api/chat" -> { body =>
      val msgs = mapper.readTree(body).get("messages")
      val last = msgs.get(msgs.size() - 1).get("content").asText()
      (200, mapper.writeValueAsString {
        val root = mapper.createObjectNode()
        root.putObject("message").put("role", "assistant")
          .put("content", s"re[${msgs.size()}]: $last")
        root.put("done", true)
        root
      })
    }))
    try {
      val p = OllamaGenerateProvider(Seq(stub.url), "test-chat")
      val got = p.chat(Seq("user" -> "q1", "assistant" -> "a1", "user" -> "q2"))
      assert(got == "re[3]: q2")
      val sent = mapper.readTree(stub.lastBody)
      assert(sent.get("messages").get(0).get("role").asText() == "user")
      assert(sent.get("messages").get(1).get("role").asText() == "assistant")
      assert(sent.get("messages").get(1).get("content").asText() == "a1")
    } finally stub.stop()
  }

  test("OllamaGenerateProvider streams NDJSON chunks and stops at done") {
    val stream =
      """{"response":"The ","done":false}
        |{"response":"answer","done":false}
        |{"response":".","done":true}
        |{"response":"TRAILING GARBAGE","done":false}
        |""".stripMargin
    val stub = new Stub(Map("/api/generate" -> { _ => (200, stream) }))
    try {
      val p = OllamaGenerateProvider(Seq(stub.url), "m")
      val chunks = p.generateStream("q").toSeq
      assert(chunks == Seq("The ", "answer", "."),
        "chunks concatenate in order; lines after done:true are dropped")
      assert(mapper.readTree(stub.lastBody).get("stream").asBoolean(false),
        "streaming call posts stream:true")
    } finally stub.stop()
  }

  test("OllamaGenerateProvider chatStream reads message.content chunks") {
    val stream =
      """{"message":{"role":"assistant","content":"to"},"done":false}
        |{"message":{"role":"assistant","content":"ken"},"done":false}
        |{"message":{"role":"assistant","content":""},"done":true}
        |""".stripMargin
    val stub = new Stub(Map("/api/chat" -> { _ => (200, stream) }))
    try {
      val p = OllamaGenerateProvider(Seq(stub.url), "m")
      assert(p.chatStream(Seq("user" -> "q")).mkString == "token")
    } finally stub.stop()
  }

  test("generate retries past a dead endpoint like the embed seam") {
    val dead = new Stub(Map("/api/generate" -> { _ => (500, "boom") }))
    val live = new Stub(Map("/api/generate" -> { _ =>
      (200, """{"response":"ok","done":true}""")
    }))
    try {
      val p = OllamaGenerateProvider(Seq(dead.url, live.url), "m", backoffMs = 1)
      assert(p.generate("q") == "ok")
      assert(dead.hits.get() >= 1, "dead endpoint was tried first or rotated over")
      // all dead → bounded sweeps then a clear error
      val allDead = OllamaGenerateProvider(Seq(dead.url), "m",
        maxRetries = 2, backoffMs = 1)
      val err = intercept[RuntimeException](allDead.generate("q"))
      assert(err.getMessage.contains("generate failed after 2 sweeps"))
    } finally { dead.stop(); live.stop() }
  }

  test("OpenAiGenerateProvider chat: bearer auth, choices[0].message.content") {
    val stub = new Stub(Map("/v1/chat/completions" -> { body =>
      val last = {
        val msgs = mapper.readTree(body).get("messages")
        msgs.get(msgs.size() - 1).get("content").asText()
      }
      (200, s"""{"choices":[{"index":0,"message":{"role":"assistant","content":"oa: $last"}}]}""")
    }))
    try {
      val p = OpenAiGenerateProvider(Seq(stub.url), "gpt-test", bearerToken = "sk-123")
      assert(p.chat(Seq("user" -> "ping")) == "oa: ping")
      assert(stub.lastAuth == "Bearer sk-123")
    } finally stub.stop()
  }

  test("OpenAiGenerateProvider generate posts /v1/completions, either shape") {
    // real API shape: choices[0].text
    val api = new Stub(Map("/v1/completions" -> { body =>
      val prompt = mapper.readTree(body).get("prompt").asText()
      (200, s"""{"choices":[{"index":0,"text":"cmpl: $prompt"}]}""")
    }))
    // the reference's proxy shape: bare `response` (generate.go decodes
    // the ollama struct)
    val proxy = new Stub(Map("/v1/completions" -> { body =>
      val prompt = mapper.readTree(body).get("prompt").asText()
      (200, s"""{"response":"prox: $prompt"}""")
    }))
    try {
      assert(OpenAiGenerateProvider(Seq(api.url), "m").generate("hi") == "cmpl: hi")
      assert(api.lastPath == "/v1/completions")
      assert(OpenAiGenerateProvider(Seq(proxy.url), "m").generate("hi") == "prox: hi")
    } finally { api.stop(); proxy.stop() }
  }

  test("OpenAiGenerateProvider streams delta chunks with SSE framing") {
    val stream =
      """data: {"choices":[{"index":0,"delta":{"content":"a"}}]}
        |
        |data: {"choices":[{"index":0,"delta":{"content":"b"}}]}
        |data: [DONE]
        |""".stripMargin
    val stub = new Stub(Map("/v1/chat/completions" -> { _ => (200, stream) }))
    try {
      val p = OpenAiGenerateProvider(Seq(stub.url), "m")
      assert(p.chatStream(Seq("user" -> "q")).mkString == "ab")
    } finally stub.stop()
  }

  test("OpenAiEmbedProvider parses data[] by index and falls back to embeddings[]") {
    // data[] arrives REVERSED — the index field is authoritative
    val openai = new Stub(Map("/v1/embeddings" -> { body =>
      val texts = mapper.readTree(body).get("input")
      val items = (texts.size() - 1 to 0 by -1).map { i =>
        val len = texts.get(i).asText().length
        s"""{"index":$i,"embedding":[$len.0,${len + 1}.0]}"""
      }
      (200, s"""{"object":"list","data":[${items.mkString(",")}]}""")
    }))
    val proxy = new Stub(Map("/v1/embeddings" -> { body =>
      val texts = mapper.readTree(body).get("input")
      val items = (0 until texts.size()).map { i =>
        val len = texts.get(i).asText().length
        s"[$len.0,${len + 1}.0]"
      }
      (200, s"""{"embeddings":[${items.mkString(",")}]}""")
    }))
    try {
      for (stub <- Seq(openai, proxy)) {
        val p = OpenAiEmbedProvider(Seq(stub.url), "text-embedding-test",
          dim = 2, bearerToken = "sk-xyz")
        val got = p.embedBatch(Seq("ab", "defgh"))
        assert(stub.lastAuth == "Bearer sk-xyz")
        assert(stub.lastBody.contains("\"model\":\"text-embedding-test\""))
        val a = VectorKernels.dequantize(got(0))
        val b = VectorKernels.dequantize(got(1))
        assert(math.abs(a(0) - 2f) < 0.05 && math.abs(a(1) - 3f) < 0.05,
          s"'ab' vector mis-ordered: ${a.toSeq}")
        assert(math.abs(b(0) - 5f) < 0.05 && math.abs(b(1) - 6f) < 0.05)
      }
    } finally { openai.stop(); proxy.stop() }
  }

  test("SearchService.chat: fetch by id, golden prompt, provider reply") {
    import spark.implicits._
    val docs = Seq(
      (1L, """{"title":"Alpha","n":1.5}"""),
      (2L, """{"title":"Beta"}"""),
      (3L, """{"title":"Gamma"}""")).toDF("document_id", "doc_json")
    val stub = new Stub(Map("/api/chat" -> { body =>
      val msgs = mapper.readTree(body).get("messages")
      (200, s"""{"message":{"role":"assistant","content":"saw ${msgs.size()} messages"},"done":true}""")
    }))
    try {
      val req = SearchService.ChatRequest(
        text = "which doc mentions Beta?",
        prefix = "Answer briefly",
        history = Seq("earlier question", "earlier answer"),
        documentIds = Seq(2L, 1L)) // out of order on purpose
      val res = SearchService.chat(spark, docs, req,
        OllamaGenerateProvider(Seq(stub.url), "m"))
      assert(res.reply == "saw 3 messages")
      // golden: reference server/chat.go:125-172 — history roles
      // alternate, docs flatten inside triple quotes in ID order,
      // "document" stays singular while "part" pluralizes, prefix joins
      // with ". ". "n: 1.5title:" is format.go:66-89's quirk: no newline
      // after a single-line value even between keys — byte parity kept.
      val expected = Seq(
        "user" -> "earlier question",
        "assistant" -> "earlier answer",
        "user" -> ("I have 2 text document that I'd like to use as context for my question. Here's the relevant parts:\n\n" +
          "\"\"\"n: 1.5title: Alpha.\"\"\"\n" +
          "\"\"\"title: Beta.\"\"\"\n\n" +
          "My question is: Answer briefly. which doc mentions Beta?"))
      assert(res.messages == expected)
    } finally stub.stop()
  }

  test("SearchService.chat keeps inline documents before fetched ones") {
    import spark.implicits._
    val docs = Seq((7L, """{"k":"fetched"}""")).toDF("document_id", "doc_json")
    val req = SearchService.ChatRequest(text = "q",
      documents = Seq("""{"k":"inline"}"""), documentIds = Seq(7L))
    val res = SearchService.chat(spark, docs, req, NoopGenerateProvider())
    val prompt = res.messages.last._2
    val inlineAt = prompt.indexOf("k: inline.")
    val fetchedAt = prompt.indexOf("k: fetched.")
    assert(inlineAt >= 0 && fetchedAt >= 0 && inlineAt < fetchedAt,
      "inline docs precede fetched docs (chat.go:120-123)")
    assert(res.reply == NoopGenerateProvider().chat(res.messages),
      "noop reply is a pure function of the assembled prompt")
  }

  test("ragChat searches then chats with the page's document ids") {
    import graft.index.IvfIndex
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings")
    val (indexed, model) = IvfIndex.build(e, "embedding",
      IvfIndex.Params(listSize = 50, sampleSize = 2000))
    val chunks = indexed.withColumnRenamed("vec_id", "document_id")
    val docsJson = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id").as("document_id"),
        to_json(struct(col("lang"), col("source"))).as("doc_json"))
    val res = SearchService.ragChat(spark, chunks, docsJson, model,
      SearchService.ChatRequest(text = "stream processing"),
      NoopGenerateProvider(), topK = 3, dim = 64)
    val prompt = res.messages.last._2
    assert(prompt.startsWith("I have 3 text document"),
      s"3 searched docs in context, got: ${prompt.take(60)}")
    assert(prompt.contains("\"\"\"lang: "), "fetched payload flattened into the prompt")
    assert(prompt.endsWith("My question is: stream processing"))
    assert(res.reply.nonEmpty)
  }
}
