package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorKernels
import graft.index.IvfIndex
import graft.sources.{IvfBinarySource, ParquetStore}
import graft.streaming.Streams

/** End-to-end lifecycle over the REAL sf0.001 corpus, chaining the
  * round-4 surfaces the per-operator specs prove in isolation:
  * stream-ingest (two micro-batches) → binary-index search → small-file
  * compaction (search results must not move) → document DELETE cascade
  * (stores + index) → search excludes the deleted documents. This is the
  * reference's upload → search → maintain → delete story (SURVEY §3) on
  * one index. */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val model = IvfIndex.Model(Array(
    VectorKernels.l2Normalize(Array.fill(64)(1f)),
    VectorKernels.l2Normalize(Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)),
    VectorKernels.l2Normalize(Array.tabulate(64)(i => if (i % 3 == 0) 1f else -0.5f))))

  test("ingest → search → compact → delete → search, one index") {
    import spark.implicits._
    def tmp(n: String) = java.nio.file.Files.createTempDirectory(n).toString
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "text")
    val docRows = docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (b1, b2) = docRows.splitAt(docRows.length / 2)

    // 1. stream-ingest in two micro-batches → multi-file lists
    val idx = tmp("life_idx")
    val ckpt = tmp("life_ckpt")
    val mem = MemoryStream[(Long, String)](spark)
    mem.addData(b1.toIndexedSeq: _*)
    Streams.runIngestBinary(mem.toDF().toDF("doc_id", "text"), model, idx, ckpt)
    mem.addData(b2.toIndexedSeq: _*)
    Streams.runIngestBinary(mem.toDF().toDF("doc_id", "text"), model, idx, ckpt)
    def load() = spark.read.format(IvfBinarySource.FORMAT).load(idx)
    val n0 = load().count()
    assert(n0 >= docRows.length, "every doc must have landed at least one chunk")
    val multiFile = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list="))
      .exists(_.listFiles().count(_.getName.endsWith(".bin")) > 1)
    assert(multiFile, "two batches should leave multi-file lists")

    // 2. search (the serving read shape) — snapshot results
    val qvec = VectorKernels.dequantize(
      VectorKernels.noopEmbed("search_query: find me things", 64))
    def top(k: Int): Seq[(Long, Double)] =
      IvfBinarySource.search(load(), model, qvec, k, nprobe = model.k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = top(20)
    assert(before.size == 20)

    // 3. compaction: one file per list afterwards, results bit-identical
    assert(IvfBinarySource.compact(spark, idx) > 0)
    assert(load().count() == n0)
    assert(top(20) == before, "compaction must not move search results")

    // 4. DELETE lifecycle: doom three docs, cascade stores + index
    val docStore = ParquetStore(tmp("life_docs"), "doc_id", nBuckets = 8)
    docStore.create(docs)
    val chunks = load().select(col("vec_id"),
      (col("vec_id") / Streams.ChunkVecIdBase).cast("long").as("doc_id"))
    val chunkStore = ParquetStore(tmp("life_chunks"), "doc_id", nBuckets = 8)
    chunkStore.create(chunks)
    val doomed = before.take(2).map(_._1 / Streams.ChunkVecIdBase).distinct.toSet
    val removed = SearchService.deleteDocuments(
      spark, docStore, chunkStore, idx, doomed)
    assert(removed > 0)
    assert(docStore.read(spark)
      .filter(col("doc_id").isin(doomed.toSeq: _*)).count() == 0)

    // 5. search again: the doomed documents' chunks are gone, the rest of
    // the ranking is the before-ranking with them removed
    val after = top(20)
    val expect = before
      .filterNot { case (vid, _) => doomed.contains(vid / Streams.ChunkVecIdBase) }
    assert(after.take(expect.size) == expect,
      "surviving ranking prefix must be stable under delete")
    assert(after.forall { case (vid, _) =>
      !doomed.contains(vid / Streams.ChunkVecIdBase) })
  }
}
