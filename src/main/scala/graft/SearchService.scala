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
    // reference prefixes "search_query: " before embedding (search.go:128)
    val qvec = VectorKernels.dequantize(
      VectorKernels.noopEmbed("search_query: " + req.text, dim))
    val probeIds = model.probe(qvec, p.nprobe)
    val scored = indexed
      .filter(col("centroid_id").isin(probeIds: _*)) // pruned scan (S4)
      .select(col("document_id"),
        gf.cosine_sim(col(vecCol), lit(qvec).cast("array<float>")).as("sim"))
      .groupBy("document_id") // A6: best chunk per document
      .agg(max("sim").as("similarity"))
      .orderBy(col("similarity").desc, col("document_id").asc)
      .limit(p.offset + p.count) // T2: distributed partial top-k
    // T3: drop the offset prefix on the tiny collected-size frame
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("similarity").desc, col("document_id").asc)
    val page = scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > p.offset).drop("_rn")
    page.join(documents, Seq("document_id"), "left") // J5 backfill
      .orderBy(col("similarity").desc, col("document_id").asc)
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
