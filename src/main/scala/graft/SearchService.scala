package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{gf, VectorKernels}
import graft.index.IvfIndex
import graft.sources.ParquetStore

/** The reference's three entry-point lifecycles (SURVEY §3) as first-class
  * engine operators over persistent stores:
  *
  *  - [[search]] — /api/search (server/search.go:45-333): embed the query
  *    text, clamp params, probe nprobe centroids, scan only those lists,
  *    per-document best-chunk dedup, deterministic top-k with offset
  *    pagination, document payload backfill.
  *  - [[refreshIndex]] — RefreshCentroids → KMeansDivideAndConquer
  *    (server/centroids.go:17-83): rebuild the centroid model from the
  *    current embeddings and persist re-assignments through the keyed
  *    store (only touched buckets rewrite).
  *  - upload (§3.2) lives in [[graft.streaming.Streams.ingestChunks]].
  */
object SearchService {

  /** Reference request semantics (search.go:73-122). */
  final case class SearchRequest(
      text: String,
      count: Int = 10, // clamped to [1, 20] (search.go:116)
      offset: Int = 0, // clamped to >= 0
      centroids: Int = 1) // 0 -> 1; negative -> all (search.go:118-122)

  final case class Clamped(count: Int, offset: Int, nprobe: Int)

  def clamp(req: SearchRequest, nLists: Int): Clamped = Clamped(
    count = math.max(1, math.min(20, req.count)),
    offset = math.max(0, req.offset),
    nprobe =
      if (req.centroids == 0) 1
      else if (req.centroids < 0) nLists
      else math.min(req.centroids, nLists))

  /** Full read path. `indexed` must carry (chunk embeddings, document_id,
    * centroid_id); `documents` carries (document_id, payload columns).
    * Returns count rows from `offset` in (similarity DESC, document_id
    * ASC) order: per-document best-chunk similarity (A6), paginated
    * top-k (T2/T3), payload backfill join (J5). */
  def search(spark: SparkSession, indexed: DataFrame, documents: DataFrame,
      model: IvfIndex.Model, req: SearchRequest,
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val p = clamp(req, model.k)
    val page = pageGraph(indexed, model, p, req.text, vecCol, dim)
    // J5 backfill, reference-shaped (database.go WHERE id IN (...)): the
    // page is ≤ count rows by construction, so collect the hit list and
    // push an IN-list filter down to the doc store scan instead of
    // building a broadcast of the whole documents table per query.
    val hits = page.collect()
    if (hits.isEmpty) {
      page.join(documents, Seq("document_id"), "left")
    } else {
      val ids = hits.map(_.getLong(0)).toSeq
      // LocalRelation, NOT sc.parallelize: the parallelize-backed frame
      // schedules its own task round just to re-emit ≤count driver-held
      // rows, which profiled as the single largest slice of per-query
      // latency (ServeProbe: backfill 182 ms of 286 ms at sf0.1). Local
      // rows broadcast straight from the driver, so the backfill is one
      // stage over the IN-pushed documents point-read.
      val hitDf = spark.createDataFrame(
        java.util.Arrays.asList(hits: _*), page.schema)
      // coalesce(1)+sortWithinPartitions, NOT orderBy: a global sort
      // range-partitions, and RangePartitioning runs a SAMPLING job over
      // the input first — two extra job rounds to order ≤count rows.
      // One partition sorted locally is the same total order.
      hitDf.join(documents.filter(col("document_id").isin(ids: _*)),
        Seq("document_id"), "left")
        .coalesce(1)
        .sortWithinPartitions(col("similarity").desc, col("document_id").asc)
    }
  }

  /** Request-level TTL cache + singleflight in front of the read path —
    * the reference's cache middleware on /api/search
    * (cache/middleware.go:18-163, 5 s TTL per config/constants.go:15).
    * Values are the COLLECTED page (≤ count+offset rows), so a hit
    * costs zero Spark jobs, and concurrent identical requests share ONE
    * execution instead of stampeding the cluster. Writers must call
    * [[CachedSearch.invalidate]] after mutating the index/documents
    * (the reference's delete/upload call cache.Delete the same way). */
  final class CachedSearch(spark: SparkSession, indexed: DataFrame,
      documents: DataFrame, model: IvfIndex.Model,
      ttlMs: Long = 5000L,
      clock: () => Long = () => System.currentTimeMillis()) {
    private val cache = new graft.operators.TtlCache[SearchRequest,
      Array[org.apache.spark.sql.Row]](ttlMs, clock = clock)
    def search(req: SearchRequest): Array[org.apache.spark.sql.Row] =
      cache.getOrCompute(req)(
        searchHot(spark, indexed, documents, model, req).collect())
    def invalidate(): Unit = cache.invalidateAll()
  }

  /** The probe → pruned scan → per-doc best-chunk → paginated top-k
    * subgraph shared by every read-path shape. */
  private def pageGraph(indexed: DataFrame, model: IvfIndex.Model,
      p: Clamped, text: String, vecCol: String, dim: Int): DataFrame = {
    // reference prefixes "search_query: " before embedding (search.go:128)
    val qvec = VectorKernels.dequantize(
      VectorKernels.noopEmbed("search_query: " + text, dim))
    val probeIds = model.probe(qvec, p.nprobe)
    val pruned = indexed
      .filter(col("centroid_id").isin(probeIds: _*)) // pruned scan (S4)
    // Serving probes are small (reference default nprobe=1, count ≤ 20):
    // nprobe × listSize rows fit one task, so collapse to a single
    // partition and the scan → per-doc max → top-k pipeline runs as ONE
    // exchange-free stage (partition/batch pruning still applies below
    // the coalesce). Analytic probes (centroids < 0 → all lists) keep the
    // distributed aggregation.
    val scanBase = if (p.nprobe <= 8) pruned.coalesce(1) else pruned
    scanBase
      .select(col("document_id"),
        gf.cosine_sim(col(vecCol), lit(qvec).cast("array<float>")).as("sim"))
      .groupBy("document_id") // A6: best chunk per document
      .agg(max("sim").as("similarity"))
      .orderBy(col("similarity").desc, col("document_id").asc)
      .limit(p.offset + p.count) // T2: distributed partial top-k
      .offset(p.offset) // T3: native offset — no window pass
  }

  /** Low-latency single-query shape: identical semantics to [[search]],
    * built as ONE execution — the ≤count page joins a BROADCAST of the
    * documents side, so there is no collect-then-replan round trip.
    *
    * When to use which (measured, local[32] sf0.1, ServeProbe): Spark's
    * per-query floor is one physical-planning pass (~35 ms) plus one
    * job round (~60 ms) regardless of data size. [[search]] pays both
    * TWICE (page job, then IN-pushdown backfill job) → ~185 ms/query;
    * this fused shape pays them once → ~135 ms/query. The price is the
    * backfill scan shape: the documents side broadcasts WHOLE, with no
    * IN-list pushdown, so it is only right when the serving payload
    * projection is dimension-sized (persist it hot). Against a 100 TB
    * document table keep [[search]] — its backfill is a pushed-down
    * point read that never scans — or better, amortize the floor across
    * a request queue with [[searchBatch]] (~24 ms/query at batch 32). */
  def searchHot(spark: SparkSession, indexed: DataFrame, documents: DataFrame,
      model: IvfIndex.Model, req: SearchRequest,
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val p = clamp(req, model.k)
    pageGraph(indexed, model, p, req.text, vecCol, dim)
      .join(broadcast(documents), Seq("document_id"), "left")
      .coalesce(1)
      .sortWithinPartitions(col("similarity").desc, col("document_id").asc)
  }

  /** Batched read path — the Spark-honest serving shape. A single-query
    * DataFrame job pays ~100-300 ms of planning + scheduling regardless
    * of data size; a service amortizes it by draining its request queue
    * into one job. One scan of the index serves every request: the
    * (request × probed-centroid) table — tiny, rows = Σ nprobe — is
    * broadcast and hash-joined against the index on centroid_id, so each
    * request still only scores its own probed lists. Per-request dedup /
    * top-k / offset run in a window partitioned by request id (bounded
    * partitions — never a global window), and payload backfill is ONE
    * join for the whole batch. Results carry `qid` = the request's index
    * in `reqs`.
    *
    * Latency note (measured, local[32], sf0.1): ~300 ms/query unbatched
    * vs < 40 ms/query at batch 30. Serving deployments should also
    * consider `spark.sql.adaptive.enabled=false` — adaptive re-planning
    * buys nothing on point queries and costs ~25%. */
  def searchBatch(spark: SparkSession, indexed: DataFrame, documents: DataFrame,
      model: IvfIndex.Model, reqs: Seq[SearchRequest],
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    import spark.implicits._
    require(reqs.nonEmpty, "empty request batch")
    // Repeated request texts are common in serving (hot queries,
    // pagination pages of one query): score each UNIQUE (text, nprobe)
    // once — scan cost follows distinct queries — and fan the scored
    // lists back out per request for its own count/offset page.
    val clamped = reqs.zipWithIndex.map { case (req, qid) =>
      (qid, req.text, clamp(req, model.k))
    }
    val uniques = clamped.map { case (_, text, p) => (text, p.nprobe) }
      .distinct.zipWithIndex
    val uOf = uniques.toMap
    val probes = uniques.flatMap { case ((text, nprobe), uqid) =>
      val qvec = VectorKernels.dequantize(
        VectorKernels.noopEmbed("search_query: " + text, dim))
      model.probe(qvec, nprobe).map(cid => (uqid, cid, qvec.toSeq))
    }
    val qdf = probes.toDF("uqid", "probe_cid", "qvec")
    val reqDf = clamped.map { case (qid, text, p) =>
      (qid, uOf((text, p.nprobe)), p.count, p.offset)
    }.toDF("qid", "uqid", "count", "offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("similarity").desc, col("document_id").asc)
    val hits = indexed
      .join(broadcast(qdf), col("centroid_id") === col("probe_cid"))
      .select(col("uqid"), col("document_id"),
        gf.cosine_sim(col(vecCol), col("qvec")).as("sim"))
      .groupBy(col("uqid"), col("document_id"))
      .agg(max("sim").as("similarity"))
      .join(broadcast(reqDf), "uqid")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > col("offset") &&
        col("_rn") <= col("offset") + col("count"))
      .select(col("qid"), col("document_id"), col("similarity"))
    hits.join(documents, Seq("document_id"), "left")
      .orderBy(col("qid").asc, col("similarity").desc, col("document_id").asc)
  }

  /** Chat request semantics (reference server/chat.go:24-30): optional
    * question prefix, alternating user/assistant history, the question
    * text, plus context documents — inline JSON blobs and/or store ids
    * to fetch. */
  final case class ChatRequest(
      text: String,
      prefix: String = "",
      history: Seq[String] = Nil,
      documentIds: Seq[Long] = Nil,
      documents: Seq[String] = Nil) // inline JSON docs, kept FIRST (chat.go:120-123)

  final case class ChatResult(messages: Seq[(String, String)], reply: String)

  /** The /api/chat lifecycle (server/chat.go:109-181): fetch the context
    * documents by id, assemble the RAG prompt — history turns, a
    * `"""flattened"""` block per document, the prefixed question — and
    * call the generate provider. The id fetch is the same bounded
    * point-read shape as [[search]]'s backfill: an IN-list filter pushed
    * to the document store scan, never a full-table pass; a chat context
    * is dozens of documents, so the collect is driver-bounded by
    * construction. Returns the assembled messages (spec'd byte-exact
    * against the reference's builder) and the provider's reply.
    *
    * `documents` must carry (`idCol`, `jsonCol`) where `jsonCol` is the
    * stored document JSON (the reference keeps uploads as JSON blobs,
    * database/model.go; relational tables get there via
    * `to_json(struct(...))`). Fetched docs append after inline ones in
    * id order — GORM's `Find(&docs, ids)` primary-key order. */
  def chat(spark: SparkSession, documents: DataFrame, req: ChatRequest,
      provider: graft.functions.GenerateProvider,
      idCol: String = "document_id", jsonCol: String = "doc_json"): ChatResult = {
    val messages = chatPrompt(documents, req, idCol, jsonCol)
    ChatResult(messages, provider.chat(messages))
  }

  /** Streaming twin of [[chat]] — token chunks in arrival order
    * (server/chat.go streams runes to the client as they decode). */
  def chatStream(spark: SparkSession, documents: DataFrame, req: ChatRequest,
      provider: graft.functions.GenerateProvider,
      idCol: String = "document_id", jsonCol: String = "doc_json"): Iterator[String] =
    provider.chatStream(chatPrompt(documents, req, idCol, jsonCol))

  /** RAG facade: the reference client's two-call flow (/api/search then
    * /api/chat with the hit ids) as one engine call — search the index,
    * feed the page's document ids to [[chat]]. */
  def ragChat(spark: SparkSession, indexed: DataFrame, documents: DataFrame,
      model: IvfIndex.Model, req: ChatRequest,
      provider: graft.functions.GenerateProvider, topK: Int = 3,
      nprobe: Int = 1, vecCol: String = "embedding", dim: Int = 64,
      idCol: String = "document_id", jsonCol: String = "doc_json"): ChatResult = {
    val page = pageGraph(indexed, model,
      Clamped(count = topK, offset = 0, nprobe = clamp(
        SearchRequest(req.text, count = topK, centroids = nprobe), model.k).nprobe),
      req.text, vecCol, dim)
    val hitIds = page.collect().map(_.getLong(0)).toSeq
    chat(spark, documents,
      req.copy(documentIds = (req.documentIds ++ hitIds).distinct),
      provider, idCol, jsonCol)
  }

  private def chatPrompt(documents: DataFrame, req: ChatRequest,
      idCol: String, jsonCol: String): Seq[(String, String)] = {
    val fetched =
      if (req.documentIds.isEmpty) Seq.empty[String]
      else documents
        .filter(col(idCol).isin(req.documentIds: _*)) // IN-pushed point read
        .select(col(idCol), col(jsonCol))
        .collect()
        .sortBy(_.getLong(0))
        .map(_.getString(1))
        .toSeq
    graft.functions.TextKernels.chatMessages(
      req.history, req.documents ++ fetched, req.prefix, req.text)
  }

  /** Full document DELETE lifecycle (reference server/delete.go:214-288):
    * the relational cascade — document + chunk stores, co-bucketed so only
    * touched buckets rewrite — plus the index half
    * ([[graft.sources.IvfBinarySource.delete]] — only lists holding the
    * doomed chunk rows rewrite). Victim chunk ids come from an id-only
    * index scan (physical column pruning: no vector bytes read) via the
    * ingest path's vec_id = doc_id·10⁵ + chunk_id encoding
    * ([[graft.streaming.Streams.ChunkVecIdBase]]). Returns the number of
    * index rows deleted. */
  def deleteDocuments(spark: SparkSession, docStore: ParquetStore,
      chunkStore: ParquetStore, indexPath: String, docIds: Set[Long]): Long = {
    if (docIds.isEmpty) return 0L
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(docIds)
    val base = graft.streaming.Streams.ChunkVecIdBase
    val ofDoomedDoc = udf((vid: Long) => bc.value.contains(vid / base))
    // doc ids map to contiguous vec_id ranges, so the doomed set has a
    // pushable envelope [min·base, (max+1)·base): the connector's vec_id
    // zone maps skip part files wholly outside it (the reference's
    // B-tree id lookup, database/model.go:9-18); the udf refines exactly
    val victims = spark.read
      .format(graft.sources.IvfBinarySource.FORMAT).load(indexPath)
      .select("vec_id")
      .filter(col("vec_id").between(docIds.min * base,
        docIds.max * base + (base - 1)) && ofDoomedDoc(col("vec_id")))
    // distributed delete: victims flow to their list's rewrite task via
    // a centroid-keyed join — a document with a million chunks never
    // lands its chunk ids on the driver (ADVICE r4)
    val removed = graft.sources.IvfBinarySource.delete(spark, indexPath, victims)
    val doomed = docIds.toSeq.toDF(docStore.keyCol).localCheckpoint(true)
    docStore.deleteKeys(doomed)
    chunkStore.deleteKeys(doomed)
    removed
  }

  /** [[deleteDocuments]] with the doomed doc ids as a DataFrame — the
    * tenant-scale path (reference delete.go's `DELETE WHERE owner_id=?`
    * has no driver bound, so neither does this): a large owner's victim
    * set never lands on the driver. The first column of `doomedDocs` is
    * the doc id. Index victims resolve via a size-gated semi join
    * ([[graft.operators.DedupOps.gateKnown]] — broadcast when the scope
    * is request-sized, sort-merge when tenant-sized) against an id-only
    * index scan bounded by the doomed [lo,hi]·base vec_id envelope
    * (zone-map file skipping, as in the Set overload). */
  def deleteDocuments(spark: SparkSession, docStore: ParquetStore,
      chunkStore: ParquetStore, indexPath: String, doomedDocs: DataFrame,
      broadcastRowLimit: Long = graft.operators.DedupOps.BroadcastRowLimit)
      : Long = {
    import graft.operators.DedupOps
    val doomed = doomedDocs
      .select(col(doomedDocs.columns.head).cast("long").as("document_id"))
      .distinct().localCheckpoint(true)
    try {
      val bounds = doomed.agg(min("document_id"), max("document_id")).collect()(0)
      if (bounds.isNullAt(0)) return 0L
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val nDoomed = doomed.count() // free once pinned
      val base = graft.streaming.Streams.ChunkVecIdBase
      val victims = spark.read
        .format(graft.sources.IvfBinarySource.FORMAT).load(indexPath)
        .select("vec_id")
        .filter(col("vec_id").between(lo * base, hi * base + (base - 1)))
        .join(DedupOps.gateKnown(doomed, nDoomed, broadcastRowLimit),
          expr(s"vec_id div $base") === col("document_id"), "left_semi")
      val removed =
        graft.sources.IvfBinarySource.delete(spark, indexPath, victims)
      docStore.deleteKeys(doomed)
      chunkStore.deleteKeys(doomed)
      removed
    } finally DedupOps.releaseCheckpoint(doomed)
  }

  /** Index refresh as a batch job: rebuild the model from the embedding
    * store's current rows, write re-assignments back through the bucketed
    * upsert — like the reference's changed-rows-only UPDATE
    * (dnc.go:223-247), only buckets holding moved rows rewrite. The store
    * must carry a `centroid_id` column (use -1 for never-assigned rows).
    * Returns the refreshed model. */
  def refreshIndex(spark: SparkSession, embStore: ParquetStore,
      vecCol: String, params: IvfIndex.Params = IvfIndex.Params()): IvfIndex.Model = {
    val current = embStore.read(spark)
    require(current.columns.contains("centroid_id"),
      "embedding store must have a centroid_id column (-1 when unassigned)")
    // IvfIndex.assign's withColumn replaces the stale centroid_id
    val (assigned, model) = IvfIndex.build(current, vecCol, params)
    val changed = assigned
      .join(current.select(col(embStore.keyCol),
        col("centroid_id").as("_old")), Seq(embStore.keyCol), "left")
      .filter(col("_old").isNull || col("_old") =!= col("centroid_id"))
      .drop("_old")
    embStore.upsert(changed.drop("centroid_sim"))
    model
  }
}
