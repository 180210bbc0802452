package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 curation additions (q107/q108/q109).
  * All three also hash-match a DuckDB oracle; the tests here pin the
  * invariants the row hash cannot express (the leakage property, the
  * batch-accounting identities, monotonicity of the cutoff sweep). */
class CurationExtrasSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf001

  // ---- q107 leakage-safe split ----

  test("q107: no near-dup pair straddles a split boundary") {
    val split = CurationQueries.q107LeakageSafeSplit(spark, dir)
      .select(col("doc_id"), col("split"))
    val pairs = DedupQueries.q22JaccardNeardup(spark, dir)
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddling == 0L, s"$straddling near-dup pairs leak across splits")
  }

  test("q107: every document gets exactly one assignment; singletons use q52's rule") {
    val docs = Tables.load(spark, dir, "documents")
    val split = CurationQueries.q107LeakageSafeSplit(spark, dir)
    assert(split.count() == docs.count())
    assert(split.select("doc_id").distinct().count() == docs.count())
    // a doc that is its own canon must get the identical split q52's
    // per-doc rule would give it (same md5-nibble function of the id)
    val nib = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    val q52Rule = when(nib.isin("c", "d"), "val")
      .when(nib.isin("e", "f"), "test").otherwise("train")
    val singletonMismatch = split
      .filter(col("canon_id") === col("doc_id"))
      .filter(col("split") =!= q52Rule)
      .count()
    assert(singletonMismatch == 0L)
  }

  test("q107: a whole near-dup cluster shares one split") {
    val split = CurationQueries.q107LeakageSafeSplit(spark, dir)
    val perCluster = split.groupBy("canon_id")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(perCluster == 0L)
  }

  // ---- q108 padding waste ----

  test("q108: token accounting is exact and waste is non-negative") {
    val report = CurationQueries.q108PaddingWaste(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
    val total = docs.select(sum(graft.functions.gf.token_count(col("text"))
      .cast("long"))).first().getLong(0)
    val rep = report.agg(
      sum("n_docs").as("d"), sum("used_tokens").as("u"),
      min("pad_tokens").as("minPad")).first()
    assert(rep.getLong(0) == docs.count(), "every doc lands in one lane")
    assert(rep.getLong(1) == total, "used_tokens conserves corpus tokens")
    assert(rep.getLong(2) >= 0L, "padding cannot be negative")
  }

  test("q108: each batch is at most 32 docs and lanes cut ceil(n/32) batches") {
    val bad = CurationQueries.q108PaddingWaste(spark, dir)
      .filter(col("n_batches") =!= ceil(col("n_docs") / 32.0).cast("long"))
      .count()
    assert(bad == 0L)
  }

  // ---- q109 quality cutoff sweep ----

  test("q109: cutoff 0.0 keeps the whole corpus and kept counts are monotone") {
    val sweep = CurationQueries.q109QualityCutoffs(spark, dir)
      .orderBy("cutoff").collect()
    val docs = Tables.load(spark, dir, "documents").count()
    val lowest = sweep.head
    assert(lowest.getDouble(0) == 0.0 || sweep.map(_.getLong(3)).max == docs,
      "the lowest band's cumulative count must cover the corpus")
    assert(sweep.map(_.getLong(3)).max == docs)
    // ascending cutoff → non-increasing kept_docs / kept_tokens
    val keptDocs = sweep.map(_.getLong(3)).toSeq
    val keptToks = sweep.map(_.getLong(4)).toSeq
    assert(keptDocs == keptDocs.sorted.reverse)
    assert(keptToks == keptToks.sorted.reverse)
  }
}
