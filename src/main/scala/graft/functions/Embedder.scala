package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Text → embedding hand-off (reference M8: ai/ollama/embed.go:19-88,
  * ai/httpclient — batched HTTP embed calls with client rotation and
  * least-connections balancing).
  *
  * Spark-native shape: `mapPartitions` drains each partition in
  * `batchSize` groups, one provider call per group — per-batch overhead
  * (connection setup, auth, serialization) amortizes exactly like the
  * reference's batch embed requests, and the provider object lives once
  * per partition (the client-per-worker pattern). A production deployment
  * implements [[EmbedProvider]] with an HTTP client; tests and benchmarks
  * use [[NoopProvider]], the deterministic twin of the reference's noop AI
  * (noop/ai.go:47-64).
  */
trait EmbedProvider extends Serializable {
  /** Embed a batch of texts; returns one packed quantized vector each
    * (the reference's wire format: [f32 min][f32 max][dim codes]). */
  def embedBatch(texts: Seq[String]): Seq[Array[Byte]]
  def dim: Int
}

/** Deterministic fake provider (text-seeded splitmix, header min=-1/max=1). */
final case class NoopProvider(dim: Int = 512) extends EmbedProvider {
  def embedBatch(texts: Seq[String]): Seq[Array[Byte]] =
    texts.map(t => VectorKernels.noopEmbed(t, dim))
}

/** Ollama-shaped HTTP provider (reference ai/ollama/embed.go:19-88): one
  * JSON POST per batch to `<endpoint>/api/embed` with
  * `{"model": m, "input": [texts…]}`, reading `{"embeddings": [[f…]…]}`
  * and quantizing each vector to the engine's packed wire format.
  *
  * Endpoint selection mirrors the reference's client manager
  * (ai/httpclient/httpclient.go:44-116 + comms Url rotation): per-JVM
  * active/total counters per endpoint, each request goes to the
  * LEAST-CONNECTIONS endpoint (ties broken by fewest total served, so
  * sequential callers round-robin), and a failed request retries on the
  * next-best endpoint with linear backoff, up to `maxRetries` sweeps
  * over the pool. The case class itself is a small serializable config —
  * the HTTP client and counters live once per executor JVM. */
final case class HttpProvider(endpoints: Seq[String], model: String,
    dim: Int, bearerToken: String = "", maxRetries: Int = 3,
    requestTimeoutMs: Long = 60000L, backoffMs: Long = 100L)
    extends EmbedProvider {
  require(endpoints.nonEmpty, "need at least one embed endpoint")

  def embedBatch(texts: Seq[String]): Seq[Array[Byte]] = {
    if (texts.isEmpty) return Seq.empty
    val mapper = HttpSeam.mapper
    val root = mapper.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("input")
    texts.foreach(arr.add)
    val body = mapper.writeValueAsString(root)
    val payload = HttpSeam.request(endpoints, "/api/embed", body,
      bearerToken, requestTimeoutMs, maxRetries, backoffMs, "embed")
    parse(mapper, payload, texts.length)
  }

  private def parse(mapper: com.fasterxml.jackson.databind.ObjectMapper,
      body: String, expect: Int): Seq[Array[Byte]] = {
    val embs = mapper.readTree(body).get("embeddings")
    require(embs != null && embs.isArray && embs.size() == expect,
      s"invalid response embeddings count (reference embed.go contract): " +
        s"got ${if (embs == null) "none" else embs.size().toString}, want $expect")
    (0 until expect).map { i =>
      val node = embs.get(i)
      val v = new Array[Float](node.size())
      var j = 0
      while (j < v.length) { v(j) = node.get(j).floatValue(); j += 1 }
      VectorKernels.quantize(v)
    }
  }
}

/** OpenAI-shaped HTTP provider (reference ai/openai/embed.go:19-88): POST
  * `<endpoint>/v1/embeddings` with `{"model": m, "input": [texts…]}` and
  * bearer auth, reading the standard `{"data": [{"index": i, "embedding":
  * [f…]}…]}` response (re-ordered by `index` — OpenAI guarantees order
  * but indexes are authoritative). Quirk note: the reference decodes the
  * openai response into its OLLAMA response struct (embed.go:84 →
  * aicomms.EmbedResponse's `embeddings` field), so it only actually works
  * against ollama-compatible proxies; we accept BOTH shapes — `data` per
  * the real API, `embeddings` for those proxies. Same endpoint rotation,
  * retry, and quantized wire format as [[HttpProvider]]. */
final case class OpenAiEmbedProvider(endpoints: Seq[String], model: String,
    dim: Int, bearerToken: String = "", maxRetries: Int = 3,
    requestTimeoutMs: Long = 60000L, backoffMs: Long = 100L)
    extends EmbedProvider {
  require(endpoints.nonEmpty, "need at least one embed endpoint")

  def embedBatch(texts: Seq[String]): Seq[Array[Byte]] = {
    if (texts.isEmpty) return Seq.empty
    val mapper = HttpSeam.mapper
    val root = mapper.createObjectNode()
    root.put("model", model)
    val arr = root.putArray("input")
    texts.foreach(arr.add)
    val body = mapper.writeValueAsString(root)
    val payload = HttpSeam.request(endpoints, "/v1/embeddings", body,
      bearerToken, requestTimeoutMs, maxRetries, backoffMs, "embed")
    parse(mapper, payload, texts.length)
  }

  private def parse(mapper: com.fasterxml.jackson.databind.ObjectMapper,
      body: String, expect: Int): Seq[Array[Byte]] = {
    val tree = mapper.readTree(body)
    def vec(node: com.fasterxml.jackson.databind.JsonNode): Array[Byte] = {
      val v = new Array[Float](node.size())
      var j = 0
      while (j < v.length) { v(j) = node.get(j).floatValue(); j += 1 }
      VectorKernels.quantize(v)
    }
    val data = tree.get("data")
    if (data != null && data.isArray) {
      require(data.size() == expect,
        s"invalid response data count: got ${data.size()}, want $expect")
      val out = new Array[Array[Byte]](expect)
      (0 until expect).foreach { i =>
        val item = data.get(i)
        val idx = if (item.has("index")) item.get("index").intValue() else i
        out(idx) = vec(item.get("embedding"))
      }
      out.toSeq
    } else {
      val embs = tree.get("embeddings") // ollama-compatible proxy shape
      require(embs != null && embs.isArray && embs.size() == expect,
        s"response has neither data[] nor embeddings[] of length $expect")
      (0 until expect).map(i => vec(embs.get(i)))
    }
  }
}

/** Shared HTTP transport behind every provider (reference
  * ai/httpclient/httpclient.go:44-116 + comms Url rotation): per-JVM
  * active/total counters per endpoint, least-connections endpoint
  * selection (ties broken by fewest total served, so sequential callers
  * round-robin), linear-backoff retry sweeps over the pool. Counters are
  * keyed by endpoint string and shared across provider kinds — like the
  * reference's per-host client manager. */
private[graft] object HttpSeam {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private[functions] lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val active =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val total =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def ctr(m: java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong],
      e: String) =
    m.computeIfAbsent(e, _ => new java.util.concurrent.atomic.AtomicLong())
  /** (active, total-served) — the least-connections sort key. */
  private[functions] def load(e: String): (Long, Long) =
    (ctr(active, e).get(), ctr(total, e).get())
  private def enter(e: String): Unit = ctr(active, e).incrementAndGet()
  private def exit(e: String): Unit = ctr(active, e).decrementAndGet()
  /** Test/inspection hook: requests actually served per endpoint. */
  private[graft] def served(e: String): Long = ctr(total, e).get()

  /** One logical request: sweep the pool least-connections-first, retry
    * failed endpoints on the next-best, linear backoff between sweeps.
    * Returns the 200 response body; throws after `maxRetries` sweeps. */
  def request(endpoints: Seq[String], path: String, body: String,
      token: String, timeoutMs: Long, maxRetries: Int, backoffMs: Long,
      what: String): String =
    sweep(endpoints, maxRetries, backoffMs, what) { ep =>
      post(ep, path, body, token, timeoutMs)
    }

  /** Streaming variant: same selection/retry for CONNECTING, then hands
    * back the response's line iterator (NDJSON streams). Mid-stream
    * failures propagate to the consumer — only connection/status errors
    * rotate, matching the reference (a stream that dies mid-flight is
    * surfaced, not silently re-run with duplicated prefix). */
  def requestLines(endpoints: Seq[String], path: String, body: String,
      token: String, timeoutMs: Long, maxRetries: Int, backoffMs: Long,
      what: String): Iterator[String] =
    sweep(endpoints, maxRetries, backoffMs, what) { ep =>
      val resp = send(ep, path, body, token, timeoutMs,
        java.net.http.HttpResponse.BodyHandlers.ofLines())
      if (resp.statusCode() != 200) {
        val err = resp.body().iterator()
        val sb = new StringBuilder
        while (err.hasNext && sb.length < 512) sb.append(err.next())
        throw new RuntimeException(s"$ep (${resp.statusCode()}): $sb")
      }
      ctr(total, ep).incrementAndGet()
      import scala.jdk.CollectionConverters._
      resp.body().iterator().asScala
    }

  private def sweep[A](endpoints: Seq[String], maxRetries: Int,
      backoffMs: Long, what: String)(one: String => A): A = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxRetries) {
      // fresh least-connections order each sweep — a dead endpoint sinks
      // to the back as its failures never bump totals
      val ordered = endpoints.sortBy(load).iterator
      while (ordered.hasNext) {
        val ep = ordered.next()
        enter(ep)
        val resp =
          try Some(one(ep))
          catch { case scala.util.control.NonFatal(e) => lastErr = e; None }
          finally exit(ep)
        resp match {
          case Some(payload) => return payload
          case None =>
        }
      }
      attempt += 1
      if (attempt < maxRetries) Thread.sleep(backoffMs * attempt)
    }
    throw new RuntimeException(
      s"$what failed after $maxRetries sweeps over ${endpoints.length} endpoints",
      lastErr)
  }

  private def send[A](endpoint: String, path: String, body: String,
      token: String, timeoutMs: Long,
      handler: java.net.http.HttpResponse.BodyHandler[A]): java.net.http.HttpResponse[A] = {
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(endpoint.stripSuffix("/") + path))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    if (token.nonEmpty) b.header("Authorization", "Bearer " + token)
    client.send(b.build(), handler)
  }

  private def post(endpoint: String, path: String, body: String,
      token: String, timeoutMs: Long): String = {
    val resp = send(endpoint, path, body, token, timeoutMs,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"$endpoint (${resp.statusCode()}): ${resp.body()}")
    ctr(total, endpoint).incrementAndGet() // only successes count as served
    resp.body()
  }
}

object Embedder {

  /** Adds `qvec binary` (packed quantized embedding) to `df` by batching
    * `textCol` through the provider, `batchSize` texts per call
    * (reference BATCH_SIZE_DATABASE=1000-shaped micro-batches). */
  def embedColumn(df: DataFrame, textCol: String, provider: EmbedProvider,
      batchSize: Int = 1000, outCol: String = "qvec"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // one provider instance per partition = the per-worker client
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = provider.embedBatch(batch.map(_.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(enc)
  }

  /** Content-addressed incremental embedding — the re-ingest cost saver:
    * a crawl refresh re-uploads mostly-unchanged documents, and the
    * embed service call is the expensive step (reference: every upload
    * pays `ai/ollama/embed.go` for every chunk). Texts whose
    * fingerprint already exists in the cache reuse the stored vector;
    * ONLY cache misses reach the provider. Returns (embedded frame,
    * updated cache).
    *
    * Scale shape: the cache join is a fingerprint equi-join (vectors
    * ride the cache side once); misses deduplicate BY FINGERPRINT
    * before embedding, so a text repeated across the batch is embedded
    * once regardless of fan-out; the updated cache appends only the new
    * fingerprints (churn-sized, like q86's work-list). Determinism:
    * same provider ⇒ byte-identical vectors whether served from cache
    * or embedded fresh (spec-pinned, including the exact provider call
    * count). */
  def embedIncremental(df: DataFrame, textCol: String,
      cache: DataFrame, provider: EmbedProvider,
      batchSize: Int = 1000, outCol: String = "qvec")
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val withFp = df.withColumn("_fp", md5(col(textCol).cast("binary")))
    val hits = withFp.join(cache.select(col("fp").as("_fp"),
        col("vec").as(outCol)), Seq("_fp"), "inner")
    val missTexts = withFp
      .join(cache.select(col("fp").as("_fp")), Seq("_fp"), "left_anti")
      .select(col("_fp"), col(textCol))
      .dropDuplicates("_fp") // embed each distinct text ONCE
    val fresh = embedColumn(missTexts, textCol, provider, batchSize, "vec")
      .select(col("_fp").as("fp"), col("vec"))
      .localCheckpoint(true) // pin: consumed by the result AND the cache
    val misses = withFp
      .join(cache.select(col("fp").as("_fp")), Seq("_fp"), "left_anti")
      .join(fresh.select(col("fp").as("_fp"), col("vec").as(outCol)), Seq("_fp"))
    val out = hits.unionByName(misses).drop("_fp")
    (out, cache.unionByName(fresh))
  }

  /** [[embedIncremental]] against a PERSISTENT fingerprint-keyed
    * [[graft.sources.ParquetStore]]: the cache survives across jobs and
    * sessions (the production shape — embedding spend is the budget
    * line re-ingest must not re-pay). Only the fresh (fp, vec) rows are
    * upserted — bucket-pruned, churn-sized writes. Returns the embedded
    * frame. */
  def embedWithStore(df: DataFrame, textCol: String,
      store: graft.sources.ParquetStore, provider: EmbedProvider,
      batchSize: Int = 1000, outCol: String = "qvec"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cache =
      if (store.isInitialized) store.read(spark).select("fp", "vec")
      else Seq.empty[(String, Array[Byte])].toDF("fp", "vec")
    val (out, _) = embedIncremental(df, textCol, cache, provider, batchSize, outCol)
    val pinned = out.localCheckpoint(true) // compute ONCE: result + upsert read it
    val fresh = pinned
      .withColumn("fp", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col(textCol).cast("binary")))
      .select(org.apache.spark.sql.functions.col("fp"),
        org.apache.spark.sql.functions.col(outCol).as("vec"))
      .join(cache.select("fp"), Seq("fp"), "left_anti")
      .dropDuplicates("fp")
    store.upsertOrCreate(fresh)
    pinned
  }
}
