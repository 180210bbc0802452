package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TrainingExport

/** The whole curation lifecycle as ONE call: raw corpus in, certified
  * training shards out. Composes the round's verdict/mixture/export
  * pieces in the order a production run needs them:
  *
  *   1. the fused dedup verdict ([[DedupQueries.q124DedupVerdict]],
  *      or its banded twin [[DedupQueries.q124bDedupVerdictBanded]]
  *      above [[BandedCorpusThreshold]] documents) decides per
  *      document — exact-fingerprint canon, quality-best cluster
  *      representative, not subsumed by a superset;
  *   2. the mixture plan ([[CurationQueries.mixtureRatesOf]]) is
  *      computed over the SURVIVORS — rates from the raw corpus would
  *      re-inflate exactly the sources dedup just trimmed;
  *   3. [[TrainingExport.exportMixedShards]] realizes the plan
  *      row-locally into deterministic, certified epoch shards.
  *
  * Scale shape: the verdict's keep set is corpus-sized, so it joins the
  * corpus on doc_id (one shuffle — unavoidable for an exact keep list);
  * everything after is the mixture/export pipeline's documented shape
  * (broadcast rates, row-local explode, one shard shuffle). Returns the
  * per-shard manifest; [[TrainingExport.verifyShards]] certifies the
  * written output independently. */
object CurationRun {

  def exportCurated(s: SparkSession, dir: String, outDir: String,
      nShards: Int, seed: Long): Seq[TrainingExport.ShardStat] = {
    // pin the survivors ONCE (RankOps convention): the frame is consumed
    // three times — mixture-rate planning, the shard write, and the
    // manifest's stat recompute — and re-running the verdict join (the
    // most expensive stage of the pipeline) per consumer tripled the
    // run; the pinned rows are the post-join (id, text, lang, source)
    // projection, the minimum the export needs anyway
    val survivors = curatedSurvivors(s, dir).localCheckpoint(true)
    val rates = CurationQueries.mixtureRatesOf(survivors)
    TrainingExport.exportMixedShards(survivors, rates, outDir, nShards, seed)
  }

  /** Above this many documents the verdict rides the BANDED pair source
    * ([[DedupQueries.q124bDedupVerdictBanded]]): the exact verdict's
    * cluster edges come from q22's uncapped shingle self-join, whose
    * per-bucket cost is df² with df unbounded — template boilerplate
    * makes that quadratic on crawl-scale corpora — while the banded
    * source (q21b LSH → candidate-bounded verify) shuffles only
    * band-bucket keys. Below it, exactness is free and preferred (the
    * same adaptive convention as DedupOps' driver/distributed and
    * broadcast/merge gates). 1M docs is where DedupScaleProbe's curves
    * cross on the benign df-flat corpus; boilerplate-heavy corpora
    * cross far earlier, and the banded path is the only safe default
    * past the threshold. */
  val BandedCorpusThreshold: Long = 1000000L

  /** The post-verdict corpus: every doc the fused verdict keeps, with
    * the columns the export needs. */
  def curatedSurvivors(s: SparkSession, dir: String): DataFrame =
    curatedSurvivors(s, dir, BandedCorpusThreshold)

  private[graft] def curatedSurvivors(s: SparkSession, dir: String,
      bandedThreshold: Long): DataFrame = {
    val verdict =
      if (Tables.load(s, dir, "documents").count() > bandedThreshold)
        DedupQueries.q124bDedupVerdictBanded(s, dir)
      else DedupQueries.q124DedupVerdict(s, dir)
    val keep = verdict.filter(col("keep")).select("doc_id")
    Tables.load(s, dir, "documents")
      .join(keep, "doc_id")
      .select("doc_id", "text", "lang", "source")
  }
}
