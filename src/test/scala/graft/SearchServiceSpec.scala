package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{gf, VectorKernels}
import graft.index.IvfIndex
import graft.sources.ParquetStore
import graft.SearchService.SearchRequest

/** The /api/search read path and the centroid-refresh job as operators. */
class SearchServiceSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // chunk table: 2 chunks per document (vec and its negation ⇒ distinct sims)
  private lazy val corpus = {
    val e = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .select(col("vec_id").as("document_id"), col("embedding"))
    val flipped = e.select(col("document_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    e.unionByName(flipped)
  }
  private lazy val built = IvfIndex.build(corpus, "embedding",
    IvfIndex.Params(listSize = 100, sampleSize = 2000))

  test("clamp mirrors the reference parameter rules") {
    import graft.SearchService.clamp
    assert(clamp(SearchRequest("q", count = 0), 5).count == 1)
    assert(clamp(SearchRequest("q", count = 99), 5).count == 20)
    assert(clamp(SearchRequest("q", offset = -3), 5).offset == 0)
    assert(clamp(SearchRequest("q", centroids = 0), 5).nprobe == 1)
    assert(clamp(SearchRequest("q", centroids = -1), 5).nprobe == 5)
    assert(clamp(SearchRequest("q", centroids = 3), 5).nprobe == 3)
  }

  test("search dedups per document, orders by similarity, paginates") {
    val (indexed, model) = built
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id").as("document_id"), col("text"))
    val page1 = SearchService.search(spark, indexed, docs, model,
      SearchRequest("find me things", count = 5, offset = 0, centroids = -1))
      .collect()
    assert(page1.length == 5)
    // one row per document, ordered by similarity desc
    assert(page1.map(_.getLong(0)).distinct.length == 5)
    val sims = page1.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // payload joined
    assert(page1.forall(r => r.getString(2) != null))

    val page2 = SearchService.search(spark, indexed, docs, model,
      SearchRequest("find me things", count = 5, offset = 5, centroids = -1))
      .collect()
    assert(page2.length == 5)
    assert(page1.map(_.getLong(0)).toSet.intersect(page2.map(_.getLong(0)).toSet).isEmpty)
    assert(page1.last.getDouble(1) >= page2.head.getDouble(1))
  }

  test("searchBatch equals independent single searches per request") {
    val (indexed, model) = built
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id").as("document_id"), col("lang"))
    val reqs = Seq(
      SearchRequest("alpha query", count = 5, offset = 0, centroids = 2),
      SearchRequest("beta query", count = 3, offset = 2, centroids = 1),
      SearchRequest("gamma query", count = 4, offset = 0, centroids = -1),
      // repeated text: scored once, paged per request (count/offset vary)
      SearchRequest("alpha query", count = 3, offset = 5, centroids = 2),
      SearchRequest("alpha query", count = 5, offset = 0, centroids = 2))
    val batch = SearchService.searchBatch(spark, indexed, docs, model, reqs)
      .collect()
      .groupBy(_.getAs[Int]("qid"))
      .map { case (qid, rows) =>
        qid -> rows.map(r => (r.getAs[Long]("document_id"),
          r.getAs[Double]("similarity"), r.getAs[String]("lang"))).toSeq
      }
    reqs.zipWithIndex.foreach { case (req, qid) =>
      val single = SearchService.search(spark, indexed, docs, model, req)
        .collect()
        .map(r => (r.getAs[Long]("document_id"),
          r.getAs[Double]("similarity"), r.getAs[String]("lang"))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single, s"request $qid")
    }
  }

  test("searchHot returns exactly what search returns, fused") {
    val (indexed, model) = built
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id").as("document_id"), col("lang"))
    val reqs = Seq(
      SearchRequest("hot alpha", count = 5, offset = 0, centroids = 2),
      SearchRequest("hot beta", count = 3, offset = 2, centroids = 1),
      SearchRequest("hot gamma", count = 4, offset = 0, centroids = -1))
    reqs.foreach { req =>
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("document_id"),
          r.getAs[Double]("similarity"), r.getAs[String]("lang"))).toSeq
      val twoPhase = rows(SearchService.search(spark, indexed, docs, model, req))
      val fused = rows(SearchService.searchHot(spark, indexed, docs, model, req))
      assert(fused == twoPhase, s"request '${req.text}'")
    }
    // the fused shape is one execution: no IN-pushdown collect round trip
    val plan = SearchService.searchHot(spark, indexed, docs, model, reqs.head)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }

  test("search with nprobe=all equals a brute-force per-document ranking") {
    val (indexed, model) = built
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id").as("document_id"), col("text"))
    val got = SearchService.search(spark, indexed, docs, model,
      SearchRequest("oracle check", count = 10, centroids = -1))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qvec = VectorKernels.dequantize(
      VectorKernels.noopEmbed("search_query: oracle check", 64))
    val brute = corpus
      .select(col("document_id"),
        gf.cosine_sim(col("embedding"), lit(qvec).cast("array<float>")).as("sim"))
      .groupBy("document_id").agg(max("sim").as("similarity"))
      .orderBy(col("similarity").desc, col("document_id").asc)
      .limit(10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == brute)
  }

  test("category-scoped search through the ownership tree stays in scope") {
    // the reference builds centroids PER CATEGORY (dnc/dnc.go:35) and
    // every search runs inside one (owner, category) scope
    // (server/search.go:130-160). Engine shape: resolve the scope via the
    // broadcast-sized ownership tree, left-semi the fact corpus down to
    // the scope, build that scope's own model, search it.
    val docsRaw = Tables.load(spark, SparkSuite.sf0001, "documents")
    val store = OwnershipStore(
      java.nio.file.Files.createTempDirectory("own_search").toString)
    store.getOrCreate(docsRaw.select(col("source").as("owner_name"),
      col("lang").as("category_name")))
    val row = store.tree(spark).orderBy("owner_id", "category_id")
      .limit(1).collect().head
    val (ownerName, catName) = (row.getString(1), row.getString(3))
    val scopedDocs = docsRaw
      .filter(col("source") === ownerName && col("lang") === catName)
      .select(col("doc_id").as("document_id"))
    val scoped = corpus.join(scopedDocs, Seq("document_id"), "left_semi")
    val (indexed, model) = IvfIndex.build(scoped, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 2000))
    val got = SearchService.search(spark, indexed,
      docsRaw.select(col("doc_id").as("document_id"), col("source"), col("lang")),
      model, SearchRequest("scoped query", count = 10, centroids = -1)).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getAs[String]("source") == ownerName &&
      r.getAs[String]("lang") == catName), "search leaked outside its category")
    // parity: scoped index search == brute force over the scoped corpus
    val qvec = VectorKernels.dequantize(
      VectorKernels.noopEmbed("search_query: scoped query", 64))
    val brute = scoped
      .select(col("document_id"),
        gf.cosine_sim(col("embedding"), lit(qvec).cast("array<float>")).as("sim"))
      .groupBy("document_id").agg(max("sim").as("similarity"))
      .orderBy(col("similarity").desc, col("document_id").asc)
      .limit(10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq == brute)
  }

  test("refreshIndex reassigns through the store, rewriting moved rows only") {
    val store = ParquetStore(
      java.nio.file.Files.createTempDirectory("emb_store").toString,
      "vec_id", nBuckets = 8)
    store.create(Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .select("vec_id", "embedding")
      .withColumn("centroid_id", lit(-1)))
    val model = SearchService.refreshIndex(spark, store, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    assert(model.k >= 2)
    val after = store.read(spark)
    assert(after.filter(col("centroid_id") === -1).count() == 0)
    assert(after.count() == 500)
    // assignments must agree with a fresh assign pass under the same model
    val expect = IvfIndex.assign(
        Tables.load(spark, SparkSuite.sf0001, "embeddings"), "embedding", model)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    after.select("vec_id", "centroid_id").collect()
      .foreach(r => assert(expect(r.getLong(0)) == r.getInt(1)))
    // idempotent refresh: second run moves nothing
    val filesBefore = store.bucketDirs
    SearchService.refreshIndex(spark, store, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    assert(store.read(spark).count() == 500)
    assert(store.bucketDirs == filesBefore)
  }

  test("deleteDocuments cascades stores and index; survivors untouched") {
    import graft.sources.IvfBinarySource
    import graft.streaming.Streams
    def tmp(n: String) = java.nio.file.Files.createTempDirectory(n).toString
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val docStore = ParquetStore(tmp("docs"), "doc_id", nBuckets = 8)
    docStore.create(docs)
    // chunk table ingested through the real chunk pipeline, chunk store
    // keyed (and co-bucketed) by the owning doc FK
    val (_, model) = built
    val chunks = Streams.ingestChunks(docs, model)
      .select(col("doc_id"),
        (col("doc_id") * Streams.ChunkVecIdBase + col("chunk_id"))
          .cast("long").as("vec_id"),
        col("qvec"), col("centroid_id").cast("int").as("centroid_id"))
      .localCheckpoint(true)
    val chunkStore = ParquetStore(tmp("chunks"), "doc_id", nBuckets = 8)
    chunkStore.create(chunks)
    val idx = tmp("idx")
    chunks.select("vec_id", "qvec", "centroid_id").write
      .format(IvfBinarySource.FORMAT).mode("overwrite").save(idx)
    val doomed = Set(3L, 7L, 11L)
    val expectRemoved = chunks
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count()
    val keepIndex = spark.read.format(IvfBinarySource.FORMAT).load(idx)
      .filter(!(col("vec_id") / Streams.ChunkVecIdBase).cast("long")
        .isin(doomed.toSeq: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val removed = SearchService.deleteDocuments(
      spark, docStore, chunkStore, idx, doomed)
    assert(removed == expectRemoved)
    assert(docStore.read(spark)
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count() == 0)
    assert(chunkStore.read(spark)
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count() == 0)
    val after = spark.read.format(IvfBinarySource.FORMAT).load(idx)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(after == keepIndex, "index must keep exactly the survivors")
    // empty-id call is a no-op
    assert(SearchService.deleteDocuments(
      spark, docStore, chunkStore, idx, Set.empty[Long]) == 0L)
  }

  test("DataFrame-victims deleteDocuments equals the Set path, with the gate forced to merge") {
    import spark.implicits._
    import graft.sources.IvfBinarySource
    import graft.streaming.Streams
    def tmp(n: String) = java.nio.file.Files.createTempDirectory(n).toString
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val docStore = ParquetStore(tmp("docs2"), "doc_id", nBuckets = 8)
    docStore.create(docs)
    val (_, model) = built
    val chunks = Streams.ingestChunks(docs, model)
      .select(col("doc_id"),
        (col("doc_id") * Streams.ChunkVecIdBase + col("chunk_id"))
          .cast("long").as("vec_id"),
        col("qvec"), col("centroid_id").cast("int").as("centroid_id"))
      .localCheckpoint(true)
    val chunkStore = ParquetStore(tmp("chunks2"), "doc_id", nBuckets = 8)
    chunkStore.create(chunks)
    val idx = tmp("idx2")
    chunks.select("vec_id", "qvec", "centroid_id").write
      .format(IvfBinarySource.FORMAT).mode("overwrite").save(idx)
    val doomed = Set(3L, 7L, 11L)
    val expectRemoved = chunks
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count()
    // broadcastRowLimit=1 pins the large-tenant regime: victims resolve
    // through the merge-hinted semi join, never a driver-held set
    val removed = SearchService.deleteDocuments(
      spark, docStore, chunkStore, idx,
      doomed.toSeq.toDF("doc_id"), broadcastRowLimit = 1L)
    assert(removed == expectRemoved)
    assert(docStore.read(spark)
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count() == 0)
    assert(chunkStore.read(spark)
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count() == 0)
    assert(spark.read.format(IvfBinarySource.FORMAT).load(idx)
      .filter((col("vec_id") / Streams.ChunkVecIdBase).cast("long")
        .isin(doomed.toSeq: _*)).count() == 0)
    // empty-victims call is a no-op
    assert(SearchService.deleteDocuments(spark, docStore, chunkStore, idx,
      spark.emptyDataFrame.select(lit(0L).as("doc_id")).filter(lit(false))) == 0L)
  }
}
