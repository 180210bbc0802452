package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.gf
import graft.index.{IvfIndex, PqCodec}

/** Pipeline-shaped queries: the reference's upload/search lifecycles
  * (SURVEY.md §3) re-expressed as DataFrame jobs, plus event-stream
  * session analysis and portable text-quality scoring.
  *
  * q26-q28 exercise non-SQL-expressible operators (IVF ANN search, the
  * flatten/chunk/embed ingest chain) → no oracle entry, driver records
  * the weaker rows-only check; their semantics are covered by ScalaTest
  * (recall + golden tests) instead. q29-q30 carry exact DuckDB oracles.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    // kernel-heavy consumers: give single-row-group scans a parallelism
    // floor (Tables.loadP) so per-doc expression work spreads across cores
    if (name == "documents" || name == "embeddings") Tables.loadP(s, dir, name)
    else Tables.load(s, dir, name)

  /** IVF-Flat ANN search (reference /api/search lifecycle, SURVEY §3.1):
    * build the index (sample → k-means → assign), probe nprobe=2 lists,
    * exact cosine top-10 inside them. listSize=100 keeps k meaningful at
    * test SF; production uses the reference's 10k (constants.go:8). */
  def q26AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // empty corpus → empty result (nothing to index or search)
    val queryRow = e.filter(col("vec_id") === 0).select(col("embedding")).head(1)
    if (queryRow.isEmpty)
      return e.select(col("vec_id"), lit(0.0).as("sim")).limit(0)
    val query = queryRow(0).getSeq[Float](0).toArray
    val (indexed, model) = IvfIndex.build(e, "embedding", IvfIndex.Params(listSize = 100))
    IvfIndex.search(indexed, model, "vec_id", "embedding", query, k = 10, nprobe = 2)
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
  }

  /** Upload-path document pipeline (SURVEY §3.2): flatten the JSON props
    * payload to canonical text, chunk it with the reference's word-budget
    * splitter, explode chunks, count tokens — grouped per event type. */
  def q27FlattenChunks(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        gf.flatten_doc(col("props")).as("flat"))
      .select(col("event_type"),
        explode(gf.split_chunks(col("flat"), lit("search_document: "), lit(256))).as("chunk"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(gf.token_count(col("chunk"))).as("total_tokens"))

  /** End-to-end ingest: noop-embed each document (reference noop provider,
    * 64-dim to match the corpus), dequantize, assign to the per-label mean
    * centroids of the embeddings table (J3 broadcast argmax), count per
    * assigned centroid. */
  def q28UploadPipeline(s: SparkSession, dir: String): DataFrame = {
    val centroids = t(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(gf.vector_mean(col("embedding")).as("c"))
      .orderBy(col("label"))
      .collect()
      .map(r => graft.functions.VectorKernels.l2Normalize(r.getSeq[Float](1).toArray))
    val model = IvfIndex.Model(centroids)
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), gf.dequantize_vec(gf.noop_embed(col("text"), 64)).as("v"))
    IvfIndex.assign(docs, "v", model)
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Sessionization over the event stream: a session break is a >30 min
    * gap per user. Exact integer microsecond arithmetic on both engines
    * (events ts is nanos in parquet; both sides truncate ns → us).
    * Mega-key disposition: lag is frame-less O(1) and the session
    * counter is a MONOTONE running sum (incremental) — a bot user
    * costs one linear task (EventSkewProbe: hot ≈ flat). */
  def q29Sessionize(s: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("us").asc, col("event_id").asc)
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
          .when(lag(col("us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(max(col("sess")).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
  }

  /** Engine-portable heuristic quality score in [0,1] — composed from
    * builtin codegen'd expressions (length/regexp/token counts), so the
    * identical arithmetic runs in DuckDB. */
  def qualityExpr(text: Column): Column = {
    val len = length(text).cast("double")
    val toks = gf.token_count(text).cast("double")
    val alphaRatio = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") / len
    val punctRatio = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / len
    val meanWord = length(regexp_replace(text, "\\s", "")).cast("double") / toks
    val lenScore = when(len >= 100 && len <= 20000, 1.0)
      .when(len >= 20, 0.5).otherwise(0.0)
    val alphaScore = when(alphaRatio >= 0.6, 1.0).otherwise(alphaRatio / 0.6)
    val punctScore = when(punctRatio <= 0.1, 1.0)
      .otherwise(greatest(lit(0.0), lit(1.0) - (punctRatio - 0.1) * 5))
    val wordScore = when(meanWord >= 3 && meanWord <= 12, 1.0).otherwise(0.5)
    when(len === 0 || toks === 0, 0.0)
      .otherwise((lenScore + alphaScore + punctScore + wordScore) / 4.0)
  }

  /** Per-document quality score + quality band histogram input. */
  def q30QualityScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), round(qualityExpr(col("text")), 4).as("quality"))

  /** The full curation run as ONE declarative manifest query, the gates
    * chained exactly as a training-data job chains them: quality ≥ 0.5
    * (q30's expression, compared on the ROUNDED score so the boundary
    * is engine-stable) → language whitelist → model-based quality gate
    * (q78's hashed-feature scorer, applied BEFORE dedup so a rejected
    * doc can't be a cluster's keeper) → exact-dedup keep-one (q18's
    * fingerprint, min-doc_id wins) → reproducible split (q52's md5
    * nibble). Emits the surviving (doc_id, lang, n_tokens, qscore,
    * split) manifest. Each stage is an already-oracle-checked operator;
    * this checks the COMPOSITION end-to-end. Dedup keep-one is a
    * min_by PARTIAL aggregate per fingerprint (map-side combined — a
    * viral duplicate's corpus-scale fp group collapses to one row per
    * task before the shuffle); everything else (heuristic gates AND
    * the model score) is row-local, so the whole manifest is STILL one
    * scan plus one fingerprint-key shuffle. */
  def q77CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val gated = graft.CurationQueries.scoreQuality(
        t(s, dir, "documents")
          .filter(round(qualityExpr(col("text")), 4) >= 0.5 &&
            col("lang").isin("en", "es", "de", "zh")))
      .filter(col("keep"))
    val nib = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    // keeper per fingerprint via min_by over the row struct — a PARTIAL
    // aggregate (one buffered row per fp per task), never a
    // `min().over(Window.partitionBy(fp))`: a viral duplicate's fp
    // group is corpus-scale and a window would funnel it — text and
    // all — through ONE task with no map-side combine and no AQE split
    gated
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy("fp")
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("text"), col("qscore")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        gf.token_count(col("r.text")).as("n_tokens"),
        col("r.qscore").as("qscore"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("qscore"),
        when(nib.isin("c", "d"), "val")
          .when(nib.isin("e", "f"), "test")
          .otherwise("train").as("split"))
  }

  /** Curation PROVENANCE — the debugging surface behind q77: every
    * document's verdict, i.e. the FIRST gate that rejected it (quality →
    * lang → model → duplicate) or 'kept'. Pipelines live and die by
    * this report: a filter change is judged by which stage's rejection
    * mass moved. Same gate expressions and ordering as q77, so
    * verdict='kept' is exactly q77's manifest membership; the dedup
    * stage judges only docs that survived the earlier gates (a rejected
    * doc can't be a cluster's keeper). Row-local gates + a narrow
    * per-fp keeper aggregate joined back over survivors (every doc
    * needs its fp's keeper, so a join is unavoidable — but it streams
    * and AQE-splits where a window would buffer the hot group) —
    * output corpus-sized by design (it's per-doc provenance). */
  def q105RejectionReport(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
    val pre = graft.CurationQueries.scoreQuality(docs)
      .withColumn("hq", round(qualityExpr(col("text")), 4))
      .withColumn("verdict",
        when(col("hq") < 0.5, "quality")
          .when(!col("lang").isin("en", "es", "de", "zh"), "lang")
          .when(!col("keep"), "model")
          .otherwise(lit(null).cast("string")))
    // per-fp keeper from a partial aggregate over NARROW (doc_id, fp)
    // rows, joined back on fp — the join streams a hot fingerprint's
    // rows and AQE can split its partition, where a window would buffer
    // the whole viral-duplicate group in one task (q77's rationale)
    val fps = pre.filter(col("verdict").isNull)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .select("doc_id", "fp")
    // null-SAFE fp equality: a null-text doc has fp = NULL, and the
    // report's contract is EVERY document's verdict — groupBy keeps the
    // null group (like the window form did), so the join back must too
    val surv = fps
      .join(fps.groupBy("fp").agg(min(col("doc_id")).as("keep_id"))
          .withColumnRenamed("fp", "_fpk"),
        col("fp") <=> col("_fpk"))
      .select(col("doc_id"),
        when(col("doc_id") =!= col("keep_id"), "duplicate")
          .otherwise("kept").as("verdict"))
    pre.filter(col("verdict").isNotNull).select("doc_id", "verdict")
      .unionByName(surv)
  }

  /** Multimodal pipeline (rows-only check; kernel semantics pinned in
    * MultimodalSpec): synthesize deterministic media blobs for each doc,
    * decode metadata, frame-sample the payload, aggregate per kind. All
    * steps are partition-local binary transforms — the 100 TB shape. */
  def q34MediaPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.mm
    t(s, dir, "documents")
      .select(col("doc_id"),
        mm.synthesize_media(col("doc_id"), (col("doc_id") % 3).cast("int"),
          lit(2048)).as("bytes"))
      .withColumn("meta", mm.decode_meta(col("bytes")))
      .withColumn("n_frames", size(mm.frame_sample(col("bytes"), lit(256), lit(4))))
      .groupBy(col("meta.kind").as("kind"))
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("meta.width")), 4).as("avg_width"),
        sum(col("n_frames")).as("total_frames"))
  }

  /** Media perceptual-hash near-dup (rows-only check; hash locality,
    * planted-pair recovery and brute-force equality pinned in
    * MultimodalSpec): every 10th blob is a lightly-perturbed copy of its
    * predecessor (recompression-noise stand-in); pHash fingerprints each
    * blob and the banded hamming join recovers the copies. The media
    * analogue of the q24b text pipeline — same banding operator, new
    * fingerprint. */
  def q101MediaPhash(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.mm
    val media = t(s, dir, "documents")
      .select(col("doc_id"),
        expr("CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 ELSE doc_id END").as("base"))
      .select(col("doc_id"),
        mm.synthesize_media(col("base"), lit(0), lit(2048)).as("orig"))
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 9,
          mm.mutate_media(col("orig"), col("doc_id"), lit(4)))
          .otherwise(col("orig")).as("bytes"))
    // star = false: this query's semantics are the complete PAIR LIST
    // (every perturbed copy next to its source); the scale-safe star
    // default is for component/verdict consumers
    mm.phashPairs(media, "doc_id", "bytes", 4, star = false)
      .orderBy("doc_a", "doc_b")
  }

  /** PCA spectrum of the embedding corpus (rows-only; eigen-structure,
    * optimality and plan shape pinned in PcaSpec): top-8 principal
    * variances and the cumulative fraction of total variance they
    * capture — the dimensionality-budget report a pipeline reads before
    * choosing the reduced dim for indexing/semantic dedup. One corpus
    * pass (partial-merged moments), driver-side Jacobi eigensolve,
    * 8-row output. */
  def q102PcaSpectrum(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pca
    val e = t(s, dir, "embeddings")
    val head = e.select("embedding").take(1)
    if (head.isEmpty) { // empty corpus: empty spectrum, not a crash
      import s.implicits._
      return Seq.empty[(Int, Double, Double)]
        .toDF("component", "variance", "cum_explained")
    }
    val dim = head(0).getSeq[Float](0).length
    val m = Pca.fit(e, "embedding", dim) // full spectrum: total = Σλ
    val total = m.eigenvalues.sum
    val rows = (0 until 8).map { i =>
      (i + 1, BigDecimal(m.eigenvalues(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(m.eigenvalues.take(i + 1).sum / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import s.implicits._
    rows.toDF("component", "variance", "cum_explained")
  }

  /** Token counting, sub-word flavored: whitespace tokens plus a BPE-ish
    * segmentation (letter runs | single digits | single symbols — the
    * pre-tokenizer shape of GPT-style BPE vocabularies) — both codegen'd
    * regex expressions the DuckDB oracle replicates byte-for-byte. */
  def q36BpeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("\\p{L}+|[0-9]|[^\\p{L}0-9\\s]"), lit(0))).as("bpe_tokens"),
        gf.token_count(col("text")).as("ws_tokens"))

  /** Near-dup dedup RESOLUTION (rows-only; DedupOpsSpec proves the
    * clustering against a driver-side union-find): documents surviving
    * dedup over the exact-Jaccard >= 0.8 pair graph, each cluster keeping
    * its minimum doc_id. */
  def q37NeardupDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.DedupOps.dedupKeepCanonical(
      t(s, dir, "documents").select("doc_id", "lang", "source"),
      "doc_id",
      DedupQueries.q22JaccardNeardup(s, dir), "doc_a", "doc_b")

  /** Vocabulary building: the corpus-wide wordcount shape (explode tokens
    * → groupBy → top-k). Partial aggregation combines map-side, the final
    * top-50 is TakeOrderedAndProject — no global sort, no hot partition. */
  def q38Vocab(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(50)

  /** Training-data cleaning pass: scrub URLs and emails, collapse
    * whitespace, lowercase — all codegen'd regexp_replace; emitted as
    * length + md5 fingerprint so the oracle verifies the exact cleaned
    * bytes without shipping full text. */
  def cleanTextExpr(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://\\S+", " ")
    val noMail = regexp_replace(noUrl, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", " ")
    lower(regexp_replace(trim(noMail), "\\s+", " "))
  }

  def q41CleanText(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), cleanTextExpr(col("text")).as("cleaned"))
      .select(col("doc_id"), length(col("cleaned")).as("clean_len"),
        md5(col("cleaned").cast("binary")).as("clean_fp"))

  /** Sequence-length histogram — the batching/packing planner's input: how
    * many docs (and how many total tokens) fall in each power-of-2 token-
    * length band. Explicit CASE boundaries (not log2 arithmetic) so the
    * bucket cut is bit-portable across engines. One scan, one tiny agg. */
  def q54LengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val toks = gf.token_count(col("text")).cast("long")
    val bucket = when(toks === 0, "0")
      .when(toks < 32, "001-031")
      .when(toks < 64, "032-063")
      .when(toks < 128, "064-127")
      .when(toks < 256, "128-255")
      .when(toks < 512, "256-511")
      .otherwise("512+")
    t(s, dir, "documents")
      .select(bucket.as("bucket"), toks.as("toks"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"))
  }

  /** PQ-compressed ANN search — the compression path PAST q26's
    * IVF-Flat: dim-64 vectors become 8-byte codes (32× vs float32),
    * the corpus-sized ADC pass reads only the code column, and the
    * exact cosine rerank touches k·rerank full vectors via a broadcast
    * id join ([[graft.index.PqCodec]] scaladoc for the 100 TB
    * rationale). Training sample is the vec_id-ordered head — bounded
    * and deterministic (production swaps in a seeded sample, same as
    * the IVF build's M1). Golden-gated: seeded training makes the
    * result frozen at sf0.001; PqCodecSpec proves recall vs brute
    * force, ADC exactness, and the code-column-only shortlist plan. */
  def q89AnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // empty corpus → empty result (nothing to train, encode, or rank)
    val queryRow = e.filter(col("vec_id") === 0).select(col("embedding")).head(1)
    if (queryRow.isEmpty)
      return e.select(col("vec_id"), lit(0.0).as("sim")).limit(0)
    val query = queryRow(0).getSeq[Float](0).toArray
    val sample = e.orderBy("vec_id").select("embedding").limit(1024)
      .collect().map(_.getSeq[Float](0).toArray)
    val model = PqCodec.train(sample, m = 8)
    val encoded = e.select(col("vec_id"), col("embedding"),
      PqCodec.pq_encode(col("embedding"), model).as("pqcode"))
    PqCodec.searchAdc(encoded, "vec_id", "pqcode", "embedding",
        model, query, k = 10, rerank = 4)
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
  }

  /** BPE merge-table learning (Sennrich et al. 2016) — tokenizer
    * TRAINING over the corpus, the op upstream of q36's segmentation.
    *
    * Scale shape: the corpus collapses ONCE to the distinct-word
    * frequency table — the only corpus-sized aggregation; everything
    * after is VOCABULARY-sized (Zipf-bounded: new words grow ~n^0.5
    * while tokens grow ~n, so at 100 TB the word table is orders of
    * magnitude smaller than the corpus). Each round then (1) counts
    * adjacent symbol pairs over word forms weighted by word frequency —
    * a vocab-sized explode with map-side partial aggregation, (2) takes
    * the global argmax pair via TakeOrdered (deterministic tie-break:
    * count desc, pair asc), (3) applies the merge with the codegen
    * [[graft.functions.BpeMergePass]] kernel. The loop is
    * driver-bounded (nMerges rounds, like the reference's k-means
    * iteration loop); forms pin every 4th round (vocab-sized
    * localCheckpoint) so lineage stays bounded while the loop runs
    * ~1.25 jobs/round instead of 2 (r18 — see the loop comment).
    *
    * Returns (merge table: rank/pair_a/pair_b/pair_count, final forms:
    * freq/sym) — the merge table IS the trained tokenizer artifact. */
  def learnBpeMerges(docs: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var forms = words.select(col("freq"), expr(
      """concat(transform(sequence(1, length(w)),
        |  i -> substring(w, i, 1)), array('</w>'))""".stripMargin).as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    // r18: checkpoint every CkptEvery-th merge instead of every round.
    // Each round's argmax job already re-executes the stacked
    // bpe_merge projections since the last checkpoint — ≤ CkptEvery-1
    // extra vocab-sized codegen passes — which is cheaper than the
    // per-round checkpoint's write+read+job (the loop was 2 jobs/round;
    // now ~1.25). The merges found are identical either way (the stack
    // computes the same forms frame the per-round pin materialized).
    val CkptEvery = 4
    var stacked = 0
    for (r <- 1 to nMerges if !exhausted) {
      val top = bpePairCounts(forms)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, c))
        forms = forms
          .select(col("freq"), gf.bpe_merge(col("sym"), a, b).as("sym"))
        stacked += 1
        if (stacked == CkptEvery) {
          forms = forms.localCheckpoint(true)
          stacked = 0
        }
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("rank", "pair_a", "pair_b", "pair_count"), forms)
  }

  /** One merge round's frequency-weighted adjacent-pair count over the
    * (freq, sym) forms frame — vocab-sized in and out (Plans.scala shows
    * this stage's plan: explode → map-side partial agg → TakeOrdered). */
  private[graft] def bpePairCounts(forms: DataFrame): DataFrame =
    forms
      .filter(size(col("sym")) >= 2) // sequence(1,0) is DESCENDING, not empty
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(sym) - 1), i -> struct(sym[i-1] AS a, sym[i] AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Tokenizer ENCODE with a learned merge table + per-language fertility
    * stats (the multilingual tokenizer-quality metric: tokens/word and
    * bytes/token — high fertility means the vocabulary serves that
    * language poorly). Scale shape: the corpus-sized word
    * stream collapses IMMEDIATELY to per-(lang, word) counts — map-side
    * combine does the heavy lifting — and everything after is
    * vocabulary-sized (Zipf-bounded). The merge list folds over each
    * distinct word ONCE (nMerges codegen kernel passes stacked in one
    * projection — column composition, not jobs), weighted by the
    * counts; no corpus-sized join, and no broadcast of a
    * possibly-100M-entry vocabulary anywhere. */
  def q96BpeFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = learnBpeMerges(docs, nMerges = 8)._1.collect()
      .map(r => (r.getString(1), r.getString(2)))
    val langWords = docs
      .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("n")) // corpus -> vocab x lang
    val sym0 = expr(
      """concat(transform(sequence(1, length(w)),
        |  i -> substring(w, i, 1)), array('</w>'))""".stripMargin)
    val encoded = merges.foldLeft(sym0) { case (sym, (a, b)) =>
      gf.bpe_merge(sym, a, b)
    }
    langWords
      .select(col("lang"), col("n"), size(encoded).as("n_tok"),
        length(col("w")).as("n_bytes"))
      .groupBy("lang")
      .agg(sum("n").as("n_words"),
        round(sum(col("n_tok") * col("n")) / sum("n"), 4).as("fertility"),
        round(sum(col("n_bytes") * col("n")) /
          sum(col("n_tok") * col("n")).cast("double"), 4).as("bytes_per_token"))
  }

  /** The learned 8-rule merge table over `documents` (driver gate:
    * rows-only — the iterative argmax loop is not SQL-expressible;
    * BpeSpec proves the algorithm against a driver-side exact recompute
    * and the textbook example, GoldenRowsSpec pins the sf0.01 table). */
  def q95BpeMerges(s: SparkSession, dir: String): DataFrame =
    learnBpeMerges(t(s, dir, "documents"), nMerges = 8)._1

  /** Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
    * model), the BPE trainer's complement: instead of GROWING a vocab by
    * greedy merges, START from a large seed of frequent substrings and
    * let hard-EM (Viterbi E-step, MLE M-step) plus pruning settle the
    * piece set and its probabilities.
    *
    * Scale shape mirrors [[learnBpeMerges]]: the corpus collapses ONCE
    * to the distinct-word frequency table (Zipf-bounded); seeding is one
    * vocab-sized substring explode with map-side partial aggregation;
    * each EM round is one vocab-sized scan through the codegen
    * [[graft.functions.UnigramSegment]] Viterbi kernel followed by a
    * partial-agg piece count whose result is PIECE-bounded (≤ seed
    * size), so every driver collect is k-means-centroid-sized — never
    * corpus- or vocabulary-sized. Hard EM (Viterbi counts rather than
    * forward-backward expectations) is a deliberate, documented
    * simplification: the E-step stays a single codegen pass, and the
    * round log-likelihood is provably non-decreasing, which UnigramSpec
    * asserts. Pruning keeps every single character (coverage can never
    * break) and drops the lowest-probability multi-char tail — the
    * hard-EM analogue of Kudo's loss-ranked prune, since a
    * Viterbi-unused piece contributes zero loss.
    *
    * Returns (pieces: rank/piece/logp, per-EM-round Viterbi
    * log-likelihoods measured BEFORE each M-step). */
  def learnUnigramLm(docs: DataFrame, vocabSize: Int = 96,
      seedSize: Int = 256, emIters: Int = 3, maxPieceLen: Int = 8)
      : (DataFrame, Seq[Double]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true) // rescanned once per EM round
    // seed: frequent substrings scored count·len (Kudo §3.2's "reasonably
    // big" seed), plus EVERY single character for segmentation coverage.
    // r19: ONE collect instead of checkpoint + two collects — the char
    // and top-multi branches union over the same substring aggregate
    // (ReuseExchange shares its exchange, so the explode runs once) and
    // the driver restores each branch's exact previous ordering: the
    // chars' piece sort uses Spark's OWN string order (unsigned UTF-8
    // bytes — Java String order differs on supplementary chars), so the
    // seed array, its FP score-sum order, and the golden tables are
    // bit-identical to the two-collect shape. 3 jobs → 1.
    val subs = words.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(1, least(length(w), $maxPieceLen)),
         |  l -> transform(sequence(1, length(w) - l + 1),
         |    p -> substring(w, p, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    // branch marker + codePointCount: Spark's length() counts code
    // POINTS while String.length counts UTF-16 units, so the driver must
    // not re-derive either the branch split or the score length
    val seedRows = subs.filter(length(col("piece")) === 1)
        .select(col("piece"), col("cnt"), lit(true).as("isChar"))
      .unionByName(subs.filter(length(col("piece")) > 1)
        .orderBy((col("cnt") * length(col("piece"))).desc, col("piece").asc)
        .limit(seedSize)
        .select(col("piece"), col("cnt"), lit(false).as("isChar")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    def cpLen(p: String): Long = p.codePointCount(0, p.length).toLong
    val chars = seedRows.filter(_._3)
      .sortWith((a, b) => utf8Lt(a._1, b._1))
    val multi = seedRows.filterNot(_._3)
      .sortWith((a, b) =>
        if (a._2 * cpLen(a._1) != b._2 * cpLen(b._1))
          a._2 * cpLen(a._1) > b._2 * cpLen(b._1)
        else utf8Lt(a._1, b._1))
    var vocab: Array[(String, Double)] = {
      // score length = String.length (UTF-16 units), exactly as the
      // previous collect's getString(0).length scored it
      val seed = (chars ++ multi).map { case (p, cnt, _) =>
        (p, cnt.toDouble * p.length) }
      val tot = seed.iterator.map(_._2).sum
      seed.map { case (p, sc) => (p, math.log(sc / tot)) }
    }
    val ll = scala.collection.mutable.ArrayBuffer.empty[Double]
    def emRound(recordLl: Boolean): Unit = {
      val counts = words.select(col("freq"),
          explode(gf.unigram_segment(col("w"), vocab.toSeq)).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1).toDouble)).toMap
      if (recordLl)
        ll += vocab.iterator.map { case (p, l) => counts.getOrElse(p, 0.0) * l }.sum
      val kept = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0.0)
        if (c > 0) Some((p, c))
        // Viterbi-unused single chars keep a floor count — coverage of
        // yet-unseen words must survive every M-step
        else if (p.length == 1) Some((p, 0.5))
        else None
      }
      val tot = kept.iterator.map(_._2).sum
      vocab = kept.map { case (p, c) => (p, math.log(c / tot)) }
    }
    (1 to emIters).foreach(_ => emRound(recordLl = true))
    // prune to the target size (single chars always survive), then one
    // more EM round renormalizes probabilities over the pruned set
    val (keepChars, keepMulti) = vocab.partition(_._1.length == 1)
    val room = math.max(0, vocabSize - keepChars.length)
    vocab = keepChars ++ keepMulti.sortBy { case (p, l) => (-l, p) }.take(room)
    emRound(recordLl = false)
    val table = vocab.sortBy { case (p, l) => (-l, p) }.zipWithIndex.map {
      case ((p, l), i) => (i + 1, p, math.rint(l * 1e6) / 1e6)
    }
    (table.toSeq.toDF("rank", "piece", "logp"), ll.toSeq)
  }

  /** The learned unigram-LM piece table over `documents` (driver gate:
    * rows-only — the EM loop is not SQL-expressible; UnigramSpec proves
    * Viterbi exactness against brute-force enumeration and EM likelihood
    * monotonicity, GoldenRowsSpec pins the sf0.001 table). */
  def q128UnigramLm(s: SparkSession, dir: String): DataFrame =
    learnUnigramLm(t(s, dir, "documents"))._1

  /** q96's fertility metric under the unigram-LM tokenizer — the
    * cross-tokenizer comparison a vocab decision needs (same per-lang
    * aggregation, same Zipf-bounded shape: corpus → (lang, word) counts,
    * then one codegen Viterbi pass over distinct words). */
  def q129UnigramFertility(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val vocab = learnUnigramLm(docs)._1
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    val langWords = docs
      .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
    langWords
      .select(col("lang"), col("n"),
        size(gf.unigram_segment(col("w"), vocab)).as("n_tok"),
        length(col("w")).as("n_bytes"))
      .groupBy("lang")
      .agg(sum("n").as("n_words"),
        round(sum(col("n_tok") * col("n")) / sum("n"), 4).as("fertility"),
        round(sum(col("n_bytes") * col("n")) /
          sum(col("n_tok") * col("n")).cast("double"), 4).as("bytes_per_token"))
  }

  /** q89's OPQ twin: same two-stage shape, same 8-byte codes, with the
    * learned rotation in front ([[graft.index.OpqCodec]] — on real
    * correlated embeddings the rotation buys ~1.6× lower quantization
    * error for free at search time; on this synthetic isotropic corpus
    * it is recall-neutral by construction, which the golden rows pin).
    * Golden-gated like q89: seeded training freezes the result. */
  def q97AnnOpq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val queryRow = e.filter(col("vec_id") === 0).select(col("embedding")).head(1)
    if (queryRow.isEmpty)
      return e.select(col("vec_id"), lit(0.0).as("sim")).limit(0)
    val query = queryRow(0).getSeq[Float](0).toArray
    val sample = e.orderBy("vec_id").select("embedding").limit(1024)
      .collect().map(_.getSeq[Float](0).toArray)
    val model = graft.index.OpqCodec.train(sample, m = 8)
    val encoded = e.select(col("vec_id"), col("embedding"),
      graft.index.OpqCodec.opq_encode(col("embedding"), model).as("opqcode"))
    graft.index.OpqCodec.searchAdc(encoded, "vec_id", "opqcode", "embedding",
        model, query, k = 10, rerank = 4)
      .select(col("vec_id"), round(col("sim"), 4).as("sim"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_bpe_merges" -> q95BpeMerges _,
    "q96_bpe_fertility" -> q96BpeFertility _,
    "q128_unigram_lm" -> q128UnigramLm _,
    "q129_unigram_fertility" -> q129UnigramFertility _,
    "q97_ann_opq" -> q97AnnOpq _,
    "q26_ann_ivf" -> q26AnnIvf _,
    "q89_ann_pq" -> q89AnnPq _,
    "q54_length_histogram" -> q54LengthHistogram _,
    "q34_media_pipeline" -> q34MediaPipeline _,
    "q101_media_phash" -> q101MediaPhash _,
    "q102_pca_spectrum" -> q102PcaSpectrum _,
    "q36_bpe_tokens" -> q36BpeTokens _,
    "q37_neardup_dedup" -> q37NeardupDedup _,
    "q38_vocab" -> q38Vocab _,
    "q41_clean_text" -> q41CleanText _,
    "q27_flatten_chunks" -> q27FlattenChunks _,
    "q28_upload_pipeline" -> q28UploadPipeline _,
    "q29_sessionize" -> q29Sessionize _,
    "q30_quality_score" -> q30QualityScore _,
    "q77_curation_pipeline" -> q77CurationPipeline _,
    "q105_rejection_report" -> q105RejectionReport _
  )

  val oracle: Map[String, String] = Map(
    "q54_length_histogram" ->
      """WITH t AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks
        |  FROM documents)
        |SELECT CASE WHEN toks = 0 THEN '0'
        |  WHEN toks < 32 THEN '001-031'
        |  WHEN toks < 64 THEN '032-063'
        |  WHEN toks < 128 THEN '064-127'
        |  WHEN toks < 256 THEN '128-255'
        |  WHEN toks < 512 THEN '256-511'
        |  ELSE '512+' END AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS total_tokens
        |FROM t GROUP BY 1""".stripMargin,
    // Connected components as a recursive transitive closure: reach(n)
    // accumulates every label reachable from n over the undirected pair
    // graph; min(reach) == the pointer-jumping result of DedupOps. The
    // closure is only feasible oracle-side (tiny near-dup graph) — the
    // Spark path stays O(log diameter) pointer jumping.
    "q37_neardup_dedup" ->
      s"""WITH RECURSIVE ${DedupQueries.jaccardPairsCte},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION
         |  SELECT doc_b, doc_a FROM jp),
         |reach(node, lab) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
         |comp AS (SELECT node, min(lab) AS comp FROM reach GROUP BY node),
         |losers AS (SELECT node FROM comp WHERE node <> comp)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT node FROM losers)""".stripMargin,
    "q41_clean_text" ->
      """SELECT doc_id, length(cleaned) AS clean_len, md5(cleaned) AS clean_fp
        |FROM (
        |  SELECT doc_id, lower(regexp_replace(trim(
        |    regexp_replace(
        |      regexp_replace(text, 'https?://\S+', ' ', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g')),
        |    '\s+', ' ', 'g')) AS cleaned
        |  FROM documents)""".stripMargin,
    "q38_vocab" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 50""".stripMargin,
    "q36_bpe_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\p{L}+|[0-9]|[^\p{L}0-9\s]')) AS bpe_tokens,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens
        |FROM documents""".stripMargin,
    "q29_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
        |m AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL THEN 1
        |         WHEN us - lag(us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        |  SELECT user_id, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM m),
        |per AS (
        |  SELECT user_id, sess, count(*) AS n_events
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, CAST(max(sess) AS BIGINT) AS n_sessions,
        |  CAST(max(n_events) AS BIGINT) AS max_session_events
        |FROM per GROUP BY user_id""".stripMargin,
    "q30_quality_score" ->
      """SELECT doc_id, round(CASE WHEN len = 0 OR toks = 0 THEN 0.0
        |  ELSE (lenScore + alphaScore + punctScore + wordScore) / 4.0 END, 4) AS quality
        |FROM (
        |  SELECT doc_id, len, toks,
        |    CASE WHEN len >= 100 AND len <= 20000 THEN 1.0
        |         WHEN len >= 20 THEN 0.5 ELSE 0.0 END AS lenScore,
        |    CASE WHEN alphaRatio >= 0.6 THEN 1.0 ELSE alphaRatio / 0.6 END AS alphaScore,
        |    CASE WHEN punctRatio <= 0.1 THEN 1.0
        |         ELSE greatest(0.0, 1.0 - (punctRatio - 0.1) * 5) END AS punctScore,
        |    CASE WHEN meanWord >= 3 AND meanWord <= 12 THEN 1.0 ELSE 0.5 END AS wordScore
        |  FROM (
        |    SELECT doc_id,
        |      CAST(length(text) AS DOUBLE) AS len,
        |      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        |      CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS DOUBLE)
        |        / length(text) AS alphaRatio,
        |      CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |        / length(text) AS punctRatio,
        |      CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |        / (CASE WHEN length(trim(text)) = 0 THEN 0
        |           ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS meanWord
        |    FROM documents))""".stripMargin,
    "q105_rejection_report" ->
      """WITH scored AS (
        |  SELECT doc_id, text, lang,
        |    round(CASE WHEN len = 0 OR toks = 0 THEN 0.0
        |      ELSE (lenScore + alphaScore + punctScore + wordScore) / 4.0 END, 4) AS quality
        |  FROM (
        |    SELECT doc_id, text, lang, len, toks,
        |      CASE WHEN len >= 100 AND len <= 20000 THEN 1.0
        |           WHEN len >= 20 THEN 0.5 ELSE 0.0 END AS lenScore,
        |      CASE WHEN alphaRatio >= 0.6 THEN 1.0 ELSE alphaRatio / 0.6 END AS alphaScore,
        |      CASE WHEN punctRatio <= 0.1 THEN 1.0
        |           ELSE greatest(0.0, 1.0 - (punctRatio - 0.1) * 5) END AS punctScore,
        |      CASE WHEN meanWord >= 3 AND meanWord <= 12 THEN 1.0 ELSE 0.5 END AS wordScore
        |    FROM (
        |      SELECT doc_id, text, lang,
        |        CAST(length(text) AS DOUBLE) AS len,
        |        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        |        CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS DOUBLE)
        |          / length(text) AS alphaRatio,
        |        CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |          / length(text) AS punctRatio,
        |        CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |          / (CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS meanWord
        |      FROM documents)))
        |, wtok AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) - 32768 AS wv
        |  FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE length(trim(text)) > 0)
        |  WHERE length(tok) > 0)
        |, wagg AS (SELECT doc_id, count(*) AS n, sum(wv) AS s FROM wtok GROUP BY doc_id)
        |, pre AS (
        |  SELECT sc.doc_id, sc.text,
        |    CASE WHEN sc.quality < 0.5 THEN 'quality'
        |         WHEN sc.lang NOT IN ('en', 'es', 'de', 'zh') THEN 'lang'
        |         WHEN coalesce(w.n, 0) = 0 OR coalesce(w.s, 0) < 0 THEN 'model'
        |         ELSE NULL END AS verdict
        |  FROM scored sc LEFT JOIN wagg w ON w.doc_id = sc.doc_id)
        |, surv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
        |         THEN 'duplicate' ELSE 'kept' END AS verdict
        |  FROM pre WHERE verdict IS NULL)
        |SELECT doc_id, verdict FROM pre WHERE verdict IS NOT NULL
        |UNION ALL
        |SELECT doc_id, verdict FROM surv""".stripMargin,
    "q77_curation_pipeline" ->
      """WITH scored AS (
        |  SELECT doc_id, text, lang,
        |    round(CASE WHEN len = 0 OR toks = 0 THEN 0.0
        |      ELSE (lenScore + alphaScore + punctScore + wordScore) / 4.0 END, 4) AS quality
        |  FROM (
        |    SELECT doc_id, text, lang, len, toks,
        |      CASE WHEN len >= 100 AND len <= 20000 THEN 1.0
        |           WHEN len >= 20 THEN 0.5 ELSE 0.0 END AS lenScore,
        |      CASE WHEN alphaRatio >= 0.6 THEN 1.0 ELSE alphaRatio / 0.6 END AS alphaScore,
        |      CASE WHEN punctRatio <= 0.1 THEN 1.0
        |           ELSE greatest(0.0, 1.0 - (punctRatio - 0.1) * 5) END AS punctScore,
        |      CASE WHEN meanWord >= 3 AND meanWord <= 12 THEN 1.0 ELSE 0.5 END AS wordScore
        |    FROM (
        |      SELECT doc_id, text, lang,
        |        CAST(length(text) AS DOUBLE) AS len,
        |        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
        |        CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS DOUBLE)
        |          / length(text) AS alphaRatio,
        |        CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |          / length(text) AS punctRatio,
        |        CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |          / (CASE WHEN length(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS meanWord
        |      FROM documents)))
        |, gated AS (
        |  SELECT doc_id, text, lang FROM scored
        |  WHERE quality >= 0.5 AND lang IN ('en', 'es', 'de', 'zh'))
        |, wtok AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) - 32768 AS wv
        |  FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE length(trim(text)) > 0)
        |  WHERE length(tok) > 0)
        |, wagg AS (SELECT doc_id, count(*) AS n, sum(wv) AS s FROM wtok GROUP BY doc_id)
        |, mgated AS (
        |  SELECT g.doc_id, g.text, g.lang,
        |    round(CAST(w.s AS DOUBLE) / 32768.0 / w.n, 6) AS qscore
        |  FROM gated g JOIN wagg w ON g.doc_id = w.doc_id
        |  WHERE w.n > 0 AND w.s >= 0)
        |, kept AS (
        |  SELECT doc_id, text, lang, qscore,
        |    min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keep_id
        |  FROM mgated)
        |SELECT doc_id, lang,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  qscore,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
        |       ELSE 'train' END AS split
        |FROM kept WHERE doc_id = keep_id""".stripMargin
  )
}
