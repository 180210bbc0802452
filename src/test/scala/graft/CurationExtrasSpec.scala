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

  // ---- q117 quality-aware representative ----

  test("q117: exactly one keeper per cluster, and it has the cluster-max quality") {
    val rep = DedupQueries.q117BestRep(spark, dir)
    val perCluster = rep.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        max("q").as("mq"),
        max(when(col("keep"), col("q"))).as("kq"))
    assert(perCluster.filter(col("kept") =!= 1L).count() == 0L,
      "every cluster keeps exactly one member")
    assert(perCluster.filter(col("kq") =!= col("mq")).count() == 0L,
      "the keeper carries the cluster-max quality score")
  }

  test("q117: keepers tie-break to the lowest doc_id and singletons keep themselves") {
    val rep = DedupQueries.q117BestRep(spark, dir).cache()
    val best = rep.groupBy("cluster_id").agg(max("q").as("mq"))
    val expectedKeeper = rep.join(best, "cluster_id")
      .filter(col("q") === col("mq"))
      .groupBy("cluster_id").agg(min("doc_id").as("exp_keep"))
    val mismatch = rep.filter(col("keep"))
      .join(expectedKeeper, "cluster_id")
      .filter(col("doc_id") =!= col("exp_keep")).count()
    assert(mismatch == 0L)
    val singles = rep.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
    val badSingle = rep.join(singles, "cluster_id")
      .filter(col("doc_id") =!= col("cluster_id") || !col("keep")).count()
    assert(badSingle == 0L, "a singleton is its own cluster and keeps itself")
    rep.unpersist()
  }

  // ---- q110 temperature mixture ----

  test("q110: probabilities normalize and alpha<1 compresses toward uniform") {
    val mix = CurationQueries.q110TemperatureMix(spark, dir).collect()
    val pSum = mix.map(_.getAs[Double]("p_sample")).sum
    assert(math.abs(pSum - 1.0) < 1e-4, s"p_sample sums to $pSum")
    val byTokens = mix.sortBy(_.getAs[Long]("tokens"))
    // temperature keeps the ordering but flattens it: the head language
    // is downweighted (boost < 1), the tail boosted (boost > 1), and
    // p_sample stays monotone in tokens
    assert(byTokens.last.getAs[Double]("boost") < 1.0, "head lang must shrink")
    assert(byTokens.head.getAs[Double]("boost") > 1.0, "tail lang must grow")
    val ps = byTokens.map(_.getAs[Double]("p_sample")).toSeq
    assert(ps == ps.sorted, "p_sample must stay monotone in token mass")
  }

  // ---- q111 mixture application ----

  test("q111: copies per doc are floor(e) or floor(e)+1, contiguous from 1") {
    val out = CurationQueries.q111MixtureApply(spark, dir)
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"))
    assert(perDoc.filter(col("mx") =!= col("n") || col("mn") =!= 1).count() == 0L,
      "copy indices must be 1..n")
    // per source, doc multiplicities may take at most two adjacent values
    val bad = perDoc.groupBy("source")
      .agg(countDistinct("n").as("k"), (max("n") - min("n")).as("spread"))
      .filter(col("k") > 2 || col("spread") > 1)
      .count()
    assert(bad == 0L, "multiplicity must be floor(e) or floor(e)+1 per source")
  }

  test("q111: deterministic across runs and realizes ~half the corpus tokens") {
    val a = CurationQueries.q111MixtureApply(spark, dir).collect().toSet
    val b = CurationQueries.q111MixtureApply(spark, dir).collect().toSet
    assert(a == b, "mixture materialization must be reproducible")
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.gf.token_count(col("text"))
        .cast("long").as("toks"))
    val total = toks.agg(sum("toks")).first().getLong(0)
    val realized = CurationQueries.q111MixtureApply(spark, dir)
      .join(toks, "doc_id").agg(sum("toks")).first().getLong(0)
    // each source targets alloc = total/(2·n_src) in expectation; the
    // fractional coins add sampling noise, so assert a wide envelope
    assert(math.abs(realized - total / 2.0) < 0.2 * total,
      s"realized $realized vs budget ${total / 2}")
  }
}
