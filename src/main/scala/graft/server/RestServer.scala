package graft.server

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SearchService
import graft.functions.{gf, EmbedProvider, GenerateProvider, NoopGenerateProvider}
import graft.index.IvfIndex
import graft.sources.{IvfBinarySource, ParquetStore}
import graft.streaming.Streams

/** The reference's HTTP serving tier (main.go:129-178, the server/ Go package) over
  * the engine's lifecycle facades — the last reference surface a user
  * could reach for: the openapi.yml routes, request/response shapes
  * (including the upload payload polymorphism, openapi.yml:163-174 —
  * `document` may be a string, array, or object; it is stored as its
  * JSON serialization and flattened by the byte-parity kernel), and the
  * zstd content-negotiation middleware (main.go:129-166, zstd-jni is
  * already on Spark's classpath).
  *
  *  - POST /api/upload          → flatten → chunk → embed → assign →
  *                                binary index + doc/chunk stores
  *                                (server/upload.go; Streams.chunkEmbed)
  *  - POST /api/search          → SearchService.search over the index
  *                                (server/search.go)
  *  - POST /api/chat            → SearchService.chat, text/plain reply
  *                                streamed chunk-by-chunk (server/chat.go)
  *  - POST /api/delete/document → SearchService.deleteDocuments cascade
  *  - POST /api/delete/owner    → same cascade over the owner's ids
  *  - POST /api/delete/category → same over the category's ids
  *  - POST /api/categories      → distinct category names (fetch.go)
  *
  * Providers are seams exactly as in the batch pipeline: the default
  * Noop pair keeps everything deterministic (tests, air-gapped runs);
  * wire Ollama/OpenAI providers for a live deployment.
  *
  * Scale notes: this is a THIN shell — every data decision stays in the
  * facades (nprobe-pruned scans, IN-pushed backfills, bucketed upserts,
  * distributed delete victims). The server itself holds only the IVF
  * model (centroid matrix, persisted under dataDir/model so restarts
  * serve the lists the writes landed in) and a doc-id counter. Tenant
  * scoping is size-gated, not driver-bounded: owner/category search
  * filters ride a gateKnown semi join (broadcast only when the scope is
  * small), and owner/category deletes keep their victim set a DataFrame
  * end-to-end — a tenant larger than driver memory still searches and
  * deletes (the reference's `WHERE owner_id=?` SQL has no driver bound
  * either). */
final class RestServer(spark: SparkSession, dataDir: String,
    dim: Int = 64, ctxNum: Int = 256,
    embedProvider: Option[EmbedProvider] = None,
    generateProvider: GenerateProvider = NoopGenerateProvider(),
    indexParams: IvfIndex.Params = IvfIndex.Params(listSize = 64, sampleSize = 50000),
    broadcastRowLimit: Long = graft.operators.DedupOps.BroadcastRowLimit) {

  private val mapper = new ObjectMapper()
  private val indexDir = s"$dataDir/index"
  private val modelDir = s"$dataDir/model"
  private val docStore = ParquetStore(s"$dataDir/documents", "document_id", nBuckets = 16)
  private val chunkStore = ParquetStore(s"$dataDir/chunks", "doc_id", nBuckets = 16)

  // the one piece of server-held state beyond config: the centroid
  // matrix (driver-side, nLists × dim floats) and the id counter. Both
  // rebuild from storage on restart.
  @volatile private var model: Option[IvfIndex.Model] = None
  private val nextId = new AtomicLong(1L)
  private val writeLock = new Object

  private def nonEmptyDir(d: String): Boolean = {
    val f = new java.io.File(d)
    f.exists() && f.listFiles() != null && f.listFiles().nonEmpty
  }
  private def hasIndex: Boolean = nonEmptyDir(indexDir)

  private def bootstrapFromStorage(): Unit = if (hasIndex) {
    val docs = docStore.read(spark)
    nextId.set(docs.agg(max("document_id")).collect()(0).getLong(0) + 1)
    // serve the SAME model the corpus was indexed under: upload persists
    // the trained centroids (the reference's DB keeps centroid rows for
    // exactly this — restarts don't re-derive the index, dnc.go /
    // database.go persistence path), so a restart probes the lists the
    // writes landed in.
    model =
      if (nonEmptyDir(modelDir)) Some(IvfIndex.loadModel(spark, modelDir))
      else {
        // pre-model-file layout fallback: quantized member means, keyed
        // by centroid_id (a delete-emptied list must not shift the rows
        // above it — the matrix row IS the stored centroid_id)
        val rows = spark.read.format(IvfBinarySource.FORMAT).load(indexDir)
          .select(col("centroid_id"), gf.dequantize_vec(col("qvec")).as("v"))
          .groupBy("centroid_id").agg(gf.vector_mean(col("v")).as("c"))
          .collect()
        if (rows.isEmpty) None
        else {
          val cents = Array.fill(rows.map(_.getInt(0)).max + 1)(new Array[Float](dim))
          rows.foreach(r => cents(r.getInt(0)) = r.getSeq[Float](1).toArray)
          Some(IvfIndex.Model(cents))
        }
      }
  }
  bootstrapFromStorage()

  private val server = HttpServer.create(new InetSocketAddress(0), 0)
  server.createContext("/api/upload", json(handleUpload, compress = true))
  server.createContext("/api/search", json(handleSearch, compress = true))
  server.createContext("/api/chat", plain(handleChat))
  server.createContext("/api/delete/document", json(handleDeleteDocument))
  server.createContext("/api/delete/owner", json(handleDeleteOwner))
  server.createContext("/api/delete/category", json(handleDeleteCategory))
  server.createContext("/api/categories", json(handleCategories))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
  def port: Int = server.getAddress.getPort

  // ---------- middleware (main.go:129-166) ----------

  /** Body reader honoring `Content-Encoding: zstd`. */
  private def readBody(ex: HttpExchange): Array[Byte] = {
    val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding")).getOrElse("")
    val in: InputStream =
      if (enc.contains("zstd")) new ZstdInputStream(ex.getRequestBody)
      else ex.getRequestBody
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Response writer honoring `Accept-Encoding: zstd` when the route
    * compresses (upload/search — chat streams plain, like the
    * reference's middleware wiring). */
  private def writeBody(ex: HttpExchange, status: Int, body: Array[Byte],
      compress: Boolean): Unit = {
    val accept = Option(ex.getRequestHeaders.getFirst("Accept-Encoding")).getOrElse("")
    if (compress && accept.contains("zstd")) {
      ex.getResponseHeaders.set("Content-Encoding", "zstd")
      ex.sendResponseHeaders(status, 0)
      val z = new ZstdOutputStream(ex.getResponseBody)
      z.write(body); z.close()
    } else {
      ex.sendResponseHeaders(status, body.length)
      val os = ex.getResponseBody
      os.write(body); os.close()
    }
  }

  private def json(handler: JsonNode => (Int, String), compress: Boolean = false)
      : com.sun.net.httpserver.HttpHandler = { ex: HttpExchange =>
    try {
      ex.getResponseHeaders.set("Content-Type", "application/json")
      if (ex.getRequestMethod != "POST" && ex.getRequestMethod != "GET") {
        ex.getResponseHeaders.set("Allow", "POST")
        writeBody(ex, 405, """{"error":"Invalid request method"}""".getBytes(UTF_8), compress)
      } else {
        val parsed =
          try Right(mapper.readTree(new String(readBody(ex), UTF_8) match {
            case "" => "{}"
            case s => s
          }))
          catch { case _: Exception => Left(()) }
        parsed match {
          case Left(_) =>
            writeBody(ex, 400, """{"error":"Invalid request"}""".getBytes(UTF_8), compress)
          case Right(node) =>
            val (status, body) = handler(node)
            writeBody(ex, status, body.getBytes(UTF_8), compress)
        }
      }
    } catch {
      case e: Exception =>
        writeBody(ex, 500,
          s"""{"error":${quote(s"Server exception: ${e.getMessage}")}}""".getBytes(UTF_8),
          compress)
    } finally ex.close()
  }

  private def plain(handler: JsonNode => (Int, Iterator[String]))
      : com.sun.net.httpserver.HttpHandler = { ex: HttpExchange =>
    // once the streaming headers are out, a mid-stream provider failure
    // can only close the connection — sendResponseHeaders is one-shot
    var headersSent = false
    try {
      ex.getResponseHeaders.set("Content-Type", "text/plain")
      if (ex.getRequestMethod != "POST") {
        ex.getResponseHeaders.set("Allow", "POST")
        writeBody(ex, 405, "Invalid request method".getBytes(UTF_8), compress = false)
        headersSent = true
      } else {
        val node =
          try mapper.readTree(new String(readBody(ex), UTF_8))
          catch { case _: Exception => null }
        if (node == null) {
          writeBody(ex, 400, "Invalid request".getBytes(UTF_8), compress = false)
          headersSent = true
        } else {
          val (status, chunks) = handler(node)
          // stream the reply as the provider yields it (chat.go streams
          // runes to the client as they decode) — chunked encoding
          ex.sendResponseHeaders(status, 0)
          headersSent = true
          val os: OutputStream = ex.getResponseBody
          chunks.foreach(c => { os.write(c.getBytes(UTF_8)); os.flush() })
          os.close()
        }
      }
    } catch {
      case e: Exception if !headersSent =>
        writeBody(ex, 500, s"Server exception: ${e.getMessage}".getBytes(UTF_8),
          compress = false)
      case _: Exception => () // stream already open: finally closes it
    } finally ex.close()
  }

  // ---------- /api/upload (server/upload.go) ----------

  private def handleUpload(req: JsonNode): (Int, String) = writeLock.synchronized {
    val docsNode = req.get("documents")
    if (docsNode == null || !docsNode.isArray || docsNode.isEmpty)
      return (400, """{"error":"no documents provided"}""")
    val owner = textOr(req, "owner", "")
    val category = textOr(req, "category", "")
    // reference upload.go:121-123: prefix joins the section text before
    // the "search_document: " marker, canonicalized "<p>. "
    val prefix = textOr(req, "prefix", "") match {
      case "" => ""
      case p => p.trim.stripSuffix(".") + ". "
    }
    val items = docsNode.elements().asScala.toSeq.map { d =>
      val ext = textOr(d, "external_id", "")
      val doc = d.get("document")
      (nextId.getAndIncrement(), ext,
        if (doc == null) "null" else mapper.writeValueAsString(doc))
    }
    import spark.implicits._
    val df = items.map { case (id, _, js) => (id, js) }.toDF("doc_id", "text")
    // pin the embedded batch: the index write, the chunk append, and (on
    // cold bootstrap) IvfIndex.build each run an action over this frame,
    // and re-deriving it would re-invoke the embed provider per action
    val emb = Streams.chunkEmbed(df, ctxNum, dim, embedProvider,
      chunkPrefix = "search_document: " + prefix).localCheckpoint(true)
    val assigned = model match {
      case Some(m) => IvfIndex.assign(emb, "embedding", m)
      case None =>
        // cold bootstrap: the first batch trains the model it is
        // assigned against (the reference boots with RefreshCentroids),
        // and the model persists so a restart serves the same lists
        val (a, m) = IvfIndex.build(emb, "embedding", indexParams)
        IvfIndex.saveModel(spark, m, modelDir)
        model = Some(m)
        a
    }
    assigned
      .select((col("doc_id") * Streams.ChunkVecIdBase + col("chunk_id"))
          .cast("long").as("vec_id"),
        col("qvec"), col("centroid_id").cast("int").as("centroid_id"))
      .write.format(IvfBinarySource.FORMAT).mode("append").save(indexDir)
    docStore.upsertOrCreate(
      items.map { case (id, ext, js) => (id, ext, owner, category, js) }
        .toDF("document_id", "external_id", "owner", "category", "doc_json"))
    // chunk store is doc-id keyed for the delete cascade (deleteKeys
    // drops every chunk row of a doomed doc), so multi-chunk docs must
    // APPEND (S6), never upsert — upsert's merge keeps one row per key
    val chunks = assigned.select("doc_id", "chunk_id", "chunk")
    if (chunkStore.isInitialized) chunkStore.append(chunks)
    else chunkStore.create(chunks)
    val ids = items.map(_._1).mkString("[", ",", "]")
    (200, s"""{"document_ids":$ids}""")
  }

  // ---------- /api/search (server/search.go) ----------

  private def handleSearch(req: JsonNode): (Int, String) = {
    val text = textOr(req, "text", null)
    if (text == null) return (400, """{"error":"Invalid request"}""")
    if (model.isEmpty || !hasIndex) return (200, """{"documents":[]}""")
    val owner = textOr(req, "owner", "")
    val category = textOr(req, "category", "")
    val noDocs = req.has("no_documents") && req.get("no_documents").asBoolean(false)
    val sreq = SearchService.SearchRequest(
      text = textOr(req, "prefix", "") match {
        case "" => text
        case p => p.trim.stripSuffix(".") + ". " + text
      },
      count = intOr(req, "count", 10),
      offset = intOr(req, "offset", 0),
      centroids = intOr(req, "centroids", 1))
    val docs = docStore.read(spark)
    val scoped = Seq(
      Option(owner).filter(_.nonEmpty).map(o => col("owner") === o),
      Option(category).filter(_.nonEmpty).map(c => col("category") === c)
    ).flatten.foldLeft(docs)((d, p) => d.filter(p))
    // tenant scope: size-gated semi filter — broadcast only when the
    // scope is small (DedupOps.gateKnown), sort-merge for a large owner;
    // a tenant whose corpus outgrows the broadcast limit must not OOM
    // the driver (the reference's WHERE owner_id=? has no such bound)
    val scopeIds =
      if (owner.isEmpty && category.isEmpty) None
      else Some(scoped.select("document_id").localCheckpoint(true))
    val rows = try {
      val base = spark.read.format(IvfBinarySource.FORMAT).load(indexDir)
        .select(col("vec_id"),
          expr(s"vec_id div ${Streams.ChunkVecIdBase}").as("document_id"),
          gf.dequantize_vec(col("qvec")).as("embedding"), col("centroid_id"))
      val indexed = scopeIds match {
        case None => base
        case Some(ids) =>
          RestServer.scopedIndex(base, ids, ids.count(), broadcastRowLimit)
      }
      SearchService.search(spark, indexed,
        scoped.select("document_id", "external_id", "doc_json"),
        model.get, sreq, dim = dim).collect()
    } finally scopeIds.foreach(graft.operators.DedupOps.releaseCheckpoint)
    val arr = mapper.createArrayNode()
    rows.foreach { r =>
      val o: ObjectNode = arr.addObject()
      o.put("document_id", r.getAs[Long]("document_id"))
      o.put("external_id", r.getAs[String]("external_id"))
      o.put("document_similarity", r.getAs[Double]("similarity"))
      if (!noDocs)
        o.set("document", mapper.readTree(r.getAs[String]("doc_json")))
    }
    val res = mapper.createObjectNode()
    res.set("documents", arr)
    (200, mapper.writeValueAsString(res))
  }

  // ---------- /api/chat (server/chat.go) ----------

  private def handleChat(req: JsonNode): (Int, Iterator[String]) = {
    val text = textOr(req, "text", null)
    if (text == null) return (400, Iterator("Invalid request"))
    val history = Option(req.get("history")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    val ids = Option(req.get("document_ids")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asLong()).toSeq).getOrElse(Nil)
    val inline = Option(req.get("documents")).filter(_.isArray)
      .map(_.elements().asScala.map(mapper.writeValueAsString(_): String).toSeq)
      .getOrElse(Nil)
    val docs =
      if (ids.isEmpty) spark.emptyDataFrame
        .withColumn("document_id", lit(0L)).withColumn("doc_json", lit(""))
      else docStore.read(spark).select("document_id", "doc_json")
    val creq = SearchService.ChatRequest(text = text,
      prefix = textOr(req, "prefix", ""), history = history,
      documentIds = ids, documents = inline)
    (200, SearchService.chatStream(spark, docs, creq, generateProvider))
  }

  // ---------- /api/delete/* (server/delete.go) ----------

  private def deleteIds(ids: Set[Long]): (Int, String) = writeLock.synchronized {
    if (ids.nonEmpty)
      SearchService.deleteDocuments(spark, docStore, chunkStore, indexDir, ids)
    (200, "{}") // delete.go:79 responds `{}`
  }

  private def handleDeleteDocument(req: JsonNode): (Int, String) = {
    val id = Option(req.get("document_id")).map(_.asLong())
    id match {
      case None => (400, """{"error":"Invalid request"}""")
      case Some(i) => deleteIds(Set(i))
    }
  }

  /** Owner/category cascade: victims stay a DataFrame end-to-end — a
    * large tenant's id set never collects to the driver (the engine's
    * answer to delete.go's `DELETE WHERE owner_id=?`). */
  private def deleteWhere(pred: org.apache.spark.sql.Column): (Int, String) =
    writeLock.synchronized {
      if (docStore.isInitialized)
        SearchService.deleteDocuments(spark, docStore, chunkStore, indexDir,
          docStore.read(spark).filter(pred).select("document_id"),
          broadcastRowLimit)
      (200, "{}")
    }

  private def handleDeleteOwner(req: JsonNode): (Int, String) =
    textOr(req, "owner", "") match {
      case "" => (400, """{"error":"Invalid request"}""")
      case o => deleteWhere(col("owner") === o)
    }

  private def handleDeleteCategory(req: JsonNode): (Int, String) =
    textOr(req, "category", "") match {
      case "" => (400, """{"error":"Invalid request"}""")
      case c => deleteWhere(col("category") === c)
    }

  // ---------- /api/categories (server/fetch.go) ----------

  private def handleCategories(req: JsonNode): (Int, String) = {
    if (!docStore.isInitialized) return (200, """{"category_names":[]}""")
    val owner = textOr(req, "owner", "")
    val base = docStore.read(spark)
    val scoped = if (owner.isEmpty) base else base.filter(col("owner") === owner)
    val names = scoped.select("category").distinct()
      .collect().map(_.getString(0)).sorted
    (200, s"""{"category_names":${names.map(quote).mkString("[", ",", "]")}}""")
  }

  // ---------- helpers ----------

  private def textOr(n: JsonNode, field: String, dflt: String): String =
    Option(n.get(field)).filter(_.isTextual).map(_.asText()).getOrElse(dflt)

  private def intOr(n: JsonNode, field: String, dflt: Int): Int =
    Option(n.get(field)).filter(_.isNumber).map(_.asInt()).getOrElse(dflt)

  private def quote(s: String): String = mapper.writeValueAsString(s)
}

object RestServer {
  /** Index rows semi-filtered to a tenant scope, size-gated
    * ([[graft.operators.DedupOps.gateKnown]]): broadcast only when the
    * scope is known-small; above the gate, a merge-hinted shuffled semi
    * join with NO BroadcastExchange regardless of AQE's runtime stats —
    * a tenant larger than the broadcast limit must not land its id set
    * on the driver. Factored out so the spec can pin the physical plan
    * on both sides of the gate. */
  def scopedIndex(base: DataFrame, scopeIds: DataFrame, knownCount: Long,
      rowLimit: Long = graft.operators.DedupOps.BroadcastRowLimit): DataFrame =
    base.join(
      graft.operators.DedupOps.gateKnown(scopeIds, knownCount, rowLimit),
      Seq("document_id"), "left_semi")
}
