package graft.functions

/** Text-generation hand-off — the reference's generate/chat provider seam
  * (ai/interface.go: Generate/GenerateStream/Chat/ChatStream behind one
  * AI interface, selected per config). Same design as [[EmbedProvider]]:
  * the case class is a small serializable config; the HTTP client and
  * endpoint counters live once per JVM ([[HttpSeam]]).
  *
  * Messages are (role, content) pairs — the shape
  * [[TextKernels.chatMessages]] assembles for the RAG chat lifecycle
  * ([[graft.SearchService.chat]]).
  */
trait GenerateProvider extends Serializable {
  /** Single-prompt completion (reference ai/ollama/generate.go:20). */
  def generate(prompt: String): String
  /** Multi-turn chat completion (reference ai/ollama/chat.go:21). */
  def chat(messages: Seq[(String, String)]): String
  /** Streaming variants: token chunks in arrival order; the concatenation
    * equals the non-streaming result for a well-behaved server (the
    * reference pipes chunk contents into one byte stream —
    * generate.go:86-157, chat.go:94-158). Defaults wrap the blocking
    * call for providers without a streaming transport. */
  def generateStream(prompt: String): Iterator[String] =
    Iterator.single(generate(prompt))
  def chatStream(messages: Seq[(String, String)]): Iterator[String] =
    Iterator.single(chat(messages))
}

/** Deterministic fake generator — the testable twin of the reference's
  * noop AI (noop/ai.go:66-95: random-length random hex, ≤512 chars).
  * Ours is input-seeded (splitmix64 over fnv1a64 of the prompt) so specs
  * and benchmarks are reproducible across JVMs, same policy as
  * [[NoopProvider]]'s embeddings vs the reference's time-seeded RNG. */
final case class NoopGenerateProvider(maxLength: Int = 512)
    extends GenerateProvider {
  def generate(prompt: String): String = hexOf("gen:" + prompt)
  def chat(messages: Seq[(String, String)]): String =
    hexOf(messages.map { case (r, c) => s"$r|$c" }.mkString("\n"))

  private def hexOf(seedText: String): String = {
    var state = VectorKernels.fnv1a64(seedText)
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // reference: rand.Intn(512) BYTES → hex doubles it; keep the byte
    // count in [0, maxLength) then hex-encode
    val nBytes = (math.floorMod(next(), maxLength.toLong)).toInt
    val sb = new StringBuilder(nBytes * 2)
    var i = 0
    while (i < nBytes) {
      sb.append(f"${next() & 0xff}%02x")
      i += 1
    }
    sb.toString
  }
}

/** Ollama-shaped HTTP generator (reference ai/ollama/generate.go:20-84,
  * chat.go:21-84): POST `/api/generate` with `{"model", "prompt",
  * "stream": false}` reading `{"response": …}`, and `/api/chat` with
  * `{"model", "messages": [{"role","content"}…], "stream": false}`
  * reading `{"message": {"content": …}}`. Streaming POSTs
  * `"stream": true` and concatenates the NDJSON chunks' response /
  * message.content until `"done": true` (generate.go:86-157,
  * chat.go:94-158). Endpoint rotation/retry via [[HttpSeam]]. */
final case class OllamaGenerateProvider(endpoints: Seq[String], model: String,
    bearerToken: String = "", maxRetries: Int = 3,
    requestTimeoutMs: Long = 120000L, backoffMs: Long = 100L)
    extends GenerateProvider {
  require(endpoints.nonEmpty, "need at least one generate endpoint")

  def generate(prompt: String): String = {
    val payload = HttpSeam.request(endpoints, "/api/generate",
      genBody(prompt, stream = false), bearerToken, requestTimeoutMs,
      maxRetries, backoffMs, "generate")
    val node = HttpSeam.mapper.readTree(payload).get("response")
    require(node != null, "generate response missing `response` field")
    node.asText()
  }

  def chat(messages: Seq[(String, String)]): String = {
    val payload = HttpSeam.request(endpoints, "/api/chat",
      chatBody(messages, stream = false), bearerToken, requestTimeoutMs,
      maxRetries, backoffMs, "chat")
    val msg = HttpSeam.mapper.readTree(payload).at("/message/content")
    require(!msg.isMissingNode, "chat response missing `message.content`")
    msg.asText()
  }

  override def generateStream(prompt: String): Iterator[String] =
    ndjson(HttpSeam.requestLines(endpoints, "/api/generate",
        genBody(prompt, stream = true), bearerToken, requestTimeoutMs,
        maxRetries, backoffMs, "generate"),
      _.get("response"))

  override def chatStream(messages: Seq[(String, String)]): Iterator[String] =
    ndjson(HttpSeam.requestLines(endpoints, "/api/chat",
        chatBody(messages, stream = true), bearerToken, requestTimeoutMs,
        maxRetries, backoffMs, "chat"),
      _.at("/message/content"))

  /** Chunk extraction over an NDJSON line stream, stopping at done:true —
    * the reference's scanner loop (chat.go:141-152). */
  private def ndjson(lines: Iterator[String],
      pick: com.fasterxml.jackson.databind.JsonNode => com.fasterxml.jackson.databind.JsonNode): Iterator[String] = {
    var done = false
    lines.takeWhile(_ => !done).flatMap { line =>
      if (line.trim.isEmpty) None
      else {
        val node = HttpSeam.mapper.readTree(line)
        val d = node.get("done")
        if (d != null && d.asBoolean(false)) done = true
        val c = pick(node)
        if (c == null || c.isMissingNode) None else Some(c.asText())
      }
    }
  }

  private def genBody(prompt: String, stream: Boolean): String = {
    val root = HttpSeam.mapper.createObjectNode()
    root.put("model", model)
    root.put("prompt", prompt)
    root.put("stream", stream)
    HttpSeam.mapper.writeValueAsString(root)
  }

  private def chatBody(messages: Seq[(String, String)], stream: Boolean): String = {
    val root = HttpSeam.mapper.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("messages")
    messages.foreach { case (role, content) =>
      val m = arr.addObject()
      m.put("role", role)
      m.put("content", content)
    }
    root.put("stream", stream)
    HttpSeam.mapper.writeValueAsString(root)
  }
}

/** OpenAI-shaped HTTP chat (reference ai/openai/chat.go:21-83): POST
  * `/v1/chat/completions` with the same messages body plus bearer auth,
  * reading `choices[0].message.content`; streaming reads SSE-ish NDJSON
  * deltas `choices[0].delta.content` (chat.go:85-163). `generate` posts
  * the legacy `/v1/completions` like the reference (generate.go:36) and
  * accepts BOTH response shapes — `choices[0].text` per the real API,
  * and the bare `response` field the reference decodes (generate.go
  * unmarshals into its ollama GenerateResponse struct, so it only works
  * against proxies answering that shape; we take either). */
final case class OpenAiGenerateProvider(endpoints: Seq[String], model: String,
    bearerToken: String = "", maxRetries: Int = 3,
    requestTimeoutMs: Long = 120000L, backoffMs: Long = 100L)
    extends GenerateProvider {
  require(endpoints.nonEmpty, "need at least one generate endpoint")

  def generate(prompt: String): String = {
    val root = HttpSeam.mapper.createObjectNode()
    root.put("model", model)
    root.put("prompt", prompt)
    root.put("stream", false)
    val payload = HttpSeam.request(endpoints, "/v1/completions",
      HttpSeam.mapper.writeValueAsString(root), bearerToken,
      requestTimeoutMs, maxRetries, backoffMs, "generate")
    val tree = HttpSeam.mapper.readTree(payload)
    val choiceText = tree.at("/choices/0/text")
    if (!choiceText.isMissingNode) choiceText.asText()
    else {
      val resp = tree.get("response") // ollama-compatible proxy shape
      require(resp != null, "completions response has neither choices[0].text nor response")
      resp.asText()
    }
  }

  def chat(messages: Seq[(String, String)]): String = {
    val payload = HttpSeam.request(endpoints, "/v1/chat/completions",
      body(messages, stream = false), bearerToken, requestTimeoutMs,
      maxRetries, backoffMs, "chat")
    val msg = HttpSeam.mapper.readTree(payload)
      .at("/choices/0/message/content")
    require(!msg.isMissingNode, "chat response missing choices[0].message.content")
    msg.asText()
  }

  override def chatStream(messages: Seq[(String, String)]): Iterator[String] = {
    val lines = HttpSeam.requestLines(endpoints, "/v1/chat/completions",
      body(messages, stream = true), bearerToken, requestTimeoutMs,
      maxRetries, backoffMs, "chat")
    lines.flatMap { raw =>
      // tolerate both bare NDJSON and SSE "data: {...}" framing
      val line = raw.trim.stripPrefix("data:").trim
      if (line.isEmpty || line == "[DONE]") None
      else {
        val c = HttpSeam.mapper.readTree(line).at("/choices/0/delta/content")
        if (c.isMissingNode) None else Some(c.asText())
      }
    }
  }

  private def body(messages: Seq[(String, String)], stream: Boolean): String = {
    val root = HttpSeam.mapper.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("messages")
    messages.foreach { case (role, content) =>
      val m = arr.addObject()
      m.put("role", role)
      m.put("content", content)
    }
    root.put("stream", stream)
    HttpSeam.mapper.writeValueAsString(root)
  }
}
