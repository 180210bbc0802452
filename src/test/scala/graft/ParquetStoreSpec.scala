package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ParquetStore

/** S6/S7/S8 sinks: bucket-partitioned append / upsert / cascading delete,
  * with the partition-pruning guarantee (untouched buckets' files are not
  * rewritten) checked via file modification times. */
class ParquetStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("store").toString

  private def docs = Tables.load(spark, SparkSuite.sf0001, "documents")
    .select("doc_id", "text", "lang", "source")

  test("create + read round-trips") {
    val store = ParquetStore(tmp(), "doc_id", nBuckets = 8)
    store.create(docs)
    assert(store.read(spark).count() == docs.count())
    assert(store.bucketDirs.nonEmpty && store.bucketDirs.forall(_.startsWith("_bucket=")))
  }

  test("append adds rows without touching existing files") {
    import spark.implicits._
    val store = ParquetStore(tmp(), "doc_id", nBuckets = 8)
    store.create(docs)
    val before = filesWithMtime(store.path)
    store.append(Seq((100000L, "new doc text", "en", "srcX"))
      .toDF("doc_id", "text", "lang", "source"))
    val after = filesWithMtime(store.path)
    // every pre-existing file untouched
    before.foreach { case (f, m) => assert(after.get(f).contains(m), f) }
    assert(store.read(spark).count() == docs.count() + 1)
  }

  test("upsert replaces matched keys, inserts new, rewrites only touched buckets") {
    import spark.implicits._
    val store = ParquetStore(tmp(), "doc_id", nBuckets = 8)
    store.create(docs)
    val before = filesWithMtime(store.path)
    val updates = Seq(
      (0L, "REWRITTEN", "en", "srcU"), // existing key
      (999999L, "INSERTED", "de", "srcU")) // new key
      .toDF("doc_id", "text", "lang", "source")
    store.upsert(updates)
    val out = store.read(spark)
    assert(out.count() == docs.count() + 1)
    assert(out.filter(col("doc_id") === 0L).head().getString(1) == "REWRITTEN")
    assert(out.filter(col("doc_id") === 999999L).head().getString(1) == "INSERTED")
    // buckets not containing either key must keep their original files
    val touched = Set(0L, 999999L).map(k =>
      s"_bucket=${spark.range(1).select(pmod(xxhash64(lit(k)), lit(8))).head().getLong(0)}")
    val after = filesWithMtime(store.path)
    before.filter { case (f, _) => !touched.exists(f.contains) }
      .foreach { case (f, m) => assert(after.get(f).contains(m), s"untouched bucket rewritten: $f") }
  }

  test("upsert with an evolved schema: new column appears, old rows read null") {
    import spark.implicits._
    val store = ParquetStore(tmp(), "doc_id", nBuckets = 4)
    store.create(Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"))
    // the update carries a column the stored rows predate
    store.upsert(Seq((2L, "b2", 0.9), (3L, "c", 0.5))
      .toDF("doc_id", "text", "quality"))
    val out = store.read(spark).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).isNullAt(2)) // old row: quality null
    assert(out(1).getString(1) == "b2" && out(1).getDouble(2) == 0.9)
    assert(out(2).getDouble(2) == 0.5)
  }

  test("cascading delete removes parent rows and co-partitioned children") {
    val parentStore = ParquetStore(tmp(), "doc_id", nBuckets = 8)
    parentStore.create(docs)
    val emb = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .withColumnRenamed("vec_id", "doc_id") // FK = doc id (1:1 in testdata)
    val childStore = ParquetStore(tmp(), "doc_id", nBuckets = 8)
    childStore.create(emb)

    val nDoomedDocs = docs.filter(col("source") === "src0").count()
    assert(nDoomedDocs > 0)
    ParquetStore.cascadeDelete(spark, parentStore, childStore, col("source") === "src0")

    val pOut = parentStore.read(spark)
    assert(pOut.count() == docs.count() - nDoomedDocs)
    assert(pOut.filter(col("source") === "src0").count() == 0)
    // child rows for deleted parents are gone; survivors match the
    // oracle-checked q20 anti-join semantics
    val expected = Queries.q20CascadeDelete(spark, SparkSuite.sf0001).count()
    assert(childStore.read(spark).count() == expected)
  }

  test("delete clears fully-doomed buckets (dynamic overwrite can't) and survives a full wipe") {
    import spark.implicits._
    // 3 keys in 16 buckets → each key is almost surely alone in its
    // bucket, so a delete dooms ENTIRE buckets: the regression regime
    // for the dynamic-partition-overwrite no-op (a bucket with no
    // surviving rows emits no output partition and kept its old files)
    val store = ParquetStore(tmp(), "k", nBuckets = 16)
    store.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    store.deleteKeys(Seq(1L, 2L).toDF("k"))
    assert(store.read(spark).select("k").collect().map(_.getLong(0)).toSeq == Seq(3L))
    // deleting the last row empties the store but keeps it READABLE
    // (schema-bearing zero-row file) and reports uninitialized
    store.deleteKeys(Seq(3L).toDF("k"))
    assert(store.read(spark).count() == 0)
    assert(!store.isInitialized)
    // and the store comes back to life through the create path
    store.upsertOrCreate(Seq((9L, "z")).toDF("k", "v"))
    assert(store.read(spark).select("v").collect().map(_.getString(0)).toSeq == Seq("z"))
  }

  test("compact folds multi-file buckets to one file; sparse buckets untouched") {
    import spark.implicits._
    val store = ParquetStore(tmp(), "doc_id", nBuckets = 4)
    store.create(docs)
    // three appends → several files per touched bucket
    (1 to 3).foreach { i =>
      store.append(Seq((200000L + i, s"late doc $i", "en", "srcZ"))
        .toDF("doc_id", "text", "lang", "source"))
    }
    val rowsBefore = store.read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def filesPerBucket: Map[String, Int] =
      store.bucketDirs.map { d =>
        d -> new java.io.File(store.path, d).listFiles()
          .count(_.getName.endsWith(".parquet"))
      }.toMap
    val before = filesPerBucket
    assert(before.values.exists(_ > 1), "appends must have split buckets")
    val sparse = before.filter(_._2 == 1).keySet
    val sparseMtimes = filesWithMtime(store.path)
      .filter { case (p, _) => sparse.exists(d => p.contains(s"/$d/")) }
    val n = store.compact(spark)
    assert(n == before.values.count(_ >= 2).toLong)
    assert(filesPerBucket.values.forall(_ == 1), "every bucket must be one file")
    // row set byte-identical, sparse buckets' files untouched
    val rowsAfter = store.read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rowsAfter == rowsBefore)
    sparseMtimes.foreach { case (p, m) =>
      assert(new java.io.File(p).lastModified() == m, s"sparse file $p rewritten")
    }
    assert(store.compact(spark) == 0L, "already-compact store is a no-op")
  }

  private def filesWithMtime(path: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }
}
