package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.gf
import graft.operators.Pins.Pinned

/** Round-4 training-data curation operators: the retrieval-index and
  * corpus-statistics shapes a 100 TB pipeline needs beyond dedup/quality
  * (COVERAGE.md "Training-pipeline extensions"). Every query here has an
  * exact DuckDB oracle.
  *
  * Scale notes are per-query; the common rule: token/bigram explodes are
  * immediately aggregated (map-side partial combine), per-term statistics
  * are tiny and broadcast back, per-document ranking windows partition on
  * doc_id — nothing here funnels the corpus through one task.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    // kernel-heavy consumers: give single-row-group scans a parallelism
    // floor (Tables.loadP) so per-doc expression work spreads across cores
    if (name == "documents" || name == "embeddings") Tables.loadP(s, dir, name)
    else Tables.load(s, dir, name)

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Terms the inverted index is built for (corpus vocabulary hits). */
  private val IDX_TERMS = Seq("data", "join", "window", "scan", "merge", "stream")

  /** Inverted index build: per term, document frequency + the first 20
    * postings (sorted doc ids). The posting list is explicitly bounded —
    * an unbounded collect_list on a hot term is the classic 100 TB
    * failure; real deployments shard postings by (term, doc_id range),
    * which this per-term cap stands in for. One distinct + one groupBy.
    * Postings are emitted comma-joined (sorted numerically first) so the
    * oracle gate can canonicalize the column — array cells aren't
    * hashable on the checker side. */
  def q56InvertedIndex(s: SparkSession, dir: String): DataFrame =
    tokens(t(s, dir, "documents"))
      .filter(col("tok").isin(IDX_TERMS: _*))
      .distinct()
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        array_join(
          expr("transform(slice(sort_array(collect_list(doc_id)), 1, 20)," +
            " x -> cast(x as string))"), ",").as("postings"))

  /** Per-document top-3 terms by tf-idf (tf × ln(N/df)) — the document
    * signature every retrieval/clustering pipeline derives. The term df
    * table is vocabulary-sized on typical corpora, but a vocabulary is
    * OPEN (a crawl's distinct-token table runs to billions: typos,
    * ids, urls) — so the join is SIZE-GATED
    * ([[graft.operators.DedupOps.gateBroadcast]]): broadcast when the
    * pinned df table is small, a deterministic sort-merge join when it
    * is not, never an unconditional broadcast hint that would OOM the
    * driver at 100×. The ranking window partitions on doc_id, so no
    * global sort and no hot partition. Both regimes plan-pinned in
    * `BroadcastGateSpec`. */
  def q57TfidfTopterms(s: SparkSession, dir: String): DataFrame =
    q57TfidfTopterms(s, dir, graft.operators.DedupOps.BroadcastRowLimit)

  private[graft] def q57TfidfTopterms(s: SparkSession, dir: String,
      rowLimit: Long): DataFrame = {
    val docs = t(s, dir, "documents")
    // corpus size rides along as a broadcast single-row aggregate instead
    // of a separate driver-side count() job
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    // tf feeds both the df aggregate and the scoring join, but it is
    // doc×term — corpus-sized. Same policy as q47's trigram stream: NOT
    // checkpointed; recomputing it costs one extra scan + partial-agg
    // exchange, while materializing it pins corpus-scale memory in the
    // block manager and an executor loss severs the lineage. (Measured
    // parity at sf0.1; at 100 TB the recompute is strictly safer.)
    val tf = tokens(docs).groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // the df AGGREGATE is pinned (vocab-sized — it is exactly the frame
    // whose size the gate measures); the corpus-sized tf stream stays
    // unmaterialized either way
    val df = graft.operators.DedupOps.gateBroadcast(
      tf.groupBy("tok").agg(count(lit(1)).as("df")), rowLimit)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "tok", "tfidf")
  }

  /** PII detection + redaction (emails, phone-shaped numbers). The corpus
    * is synthetic, so deterministic PII is grafted on per row first —
    * the operator under test is the codegen'd regexp detect/redact pass,
    * verified by count + exact redacted-bytes fingerprint. One map pass,
    * no shuffle at all. */
  def q58PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val phoneRe = "555-[0-9]{4}"
    val aug = concat(col("text"), lit(" contact u"),
      col("doc_id").cast("string"), lit("@example.com or call 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    t(s, dir, "documents")
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0))).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("redacted_fp"))
  }

  /** Unicode NFC normalization gate (q58's pattern: the corpus is ASCII,
    * so deterministic DECOMPOSED unicode is grafted on per row first —
    * the operator under test is the codegen'd [[graft.functions.NfcNormalize]]
    * pass, the normalization step curation pipelines run before
    * fingerprinting so visually-identical texts dedup together).
    * Verified by codepoint-count delta (each combining pair composes to
    * one char) and the exact fingerprint of the normalized text. One
    * map pass, no shuffle. DuckDB twin: `nfc_normalize` — both are
    * Unicode-conformant canonical composition. */
  def q103UnicodeClean(s: SparkSession, dir: String): DataFrame = {
    // DECOMPOSED pairs (base char + combining mark: U+0301/030A/0308/0303)
    // so the normalizer has real work; all BMP, so Spark UTF-16 length
    // equals DuckDB's codepoint length
    val suffixes = array(lit(" café"), lit(" Ångstrom"),
      lit(" töne"), lit(" mañana"))
    val aug = concat(col("text"),
      element_at(suffixes, (pmod(col("doc_id"), lit(4)) + 1).cast("int")))
    t(s, dir, "documents")
      .select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        length(col("aug")).as("len_raw"),
        length(gf.nfc_normalize(col("aug"))).as("len_nfc"),
        md5(gf.nfc_normalize(col("aug")).cast("binary")).as("nfc_fp"))
  }

  /** HTML → text extraction (the crawl-curation step in front of every
    * filter here: strip script/style blocks, strip tags, decode
    * entities, collapse whitespace — the C4/WET extraction shape).
    * q58's pattern: the corpus is plain text, so each row is first
    * wrapped in deterministic HTML (head/style boilerplate, headings,
    * entities, a script block keyed by doc_id) and the operator under
    * test is the codegen'd regexp/replace extraction chain, gated by
    * exact extracted-bytes fingerprint + length. One map pass, no
    * shuffle; every pattern is RE2-safe so the DuckDB twin runs the
    * SAME expressions. */
  def q104HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(
      lit("<html><head><title>doc </title><style>body { color: red }</style>" +
        "</head><body><h1 class=\"hd\">Doc &amp; heading</h1><p>"),
      col("text"),
      lit("</p><script type=\"text/javascript\">var x = "),
      col("doc_id").cast("string"),
      lit("; alert(x)</script><div>tail &lt;quote&gt; &#39;q&#39;</div>" +
        "</body></html>"))
    // extraction chain (order matters: blocks, then tags, then entities)
    def extract(c: org.apache.spark.sql.Column) = {
      val noScript = regexp_replace(c, "(?s)<script[^>]*>.*?</script>", " ")
      val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
      val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
      // entity strings are regex-metachar-free, so the same literal
      // patterns run under Java regex here and RE2 in DuckDB; &amp; LAST
      // (double-escape safety)
      val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&#39;" -> "'",
        "&quot;" -> "\"", "&amp;" -> "&")
      val decoded = entities.foldLeft(noTags) { case (cc, (e, ch)) =>
        regexp_replace(cc, e, ch)
      }
      trim(regexp_replace(decoded, "\\s+", " "))
    }
    t(s, dir, "documents")
      .select(col("doc_id"), extract(aug).as("clean"))
      .select(col("doc_id"),
        length(col("clean")).as("len_clean"),
        md5(col("clean").cast("binary")).as("clean_fp"))
  }

  /** Sequence-packing plan: documents packed in doc_id order into
    * [[PackSeqLen]]-token bins, per language. Bin id = tokens-before-me
    * ÷ capacity, i.e. contiguous fill with overflow to the next
    * boundary; integer arithmetic end to end. The running offsets ride
    * the same [[graft.operators.RankOps.runningSumPer]] range-exchange
    * shape as [[packSequences]] (q132) — a per-language WINDOW would
    * funnel a mega-language through one task; `PackPlanSpec` pins both
    * plans. */
  def q59PackPlan(s: SparkSession, dir: String): DataFrame = {
    val narrow = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        gf.token_count(col("text")).cast("long").as("toks"))
    graft.operators.RankOps
      .runningSumPer(narrow, "lang", Seq(col("doc_id").asc), "toks", "cum")
      .withColumn("bin", expr(s"(cum - toks) div $PackSeqLen"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("bin_tokens"))
  }

  /** Sequence packing EXECUTED — q59 plans bin sizes; this materializes
    * the trainer's actual input: per language, the corpus token stream
    * (docs concatenated in doc_id order) chopped into consecutive
    * `seqLen`-token sequences, documents SPLIT across sequence
    * boundaries (the GPT-style packing that wastes zero pad tokens —
    * q108 prices the padded alternative). Every interior sequence holds
    * exactly `seqLen` tokens by construction; only each language's last
    * sequence is short. Output per (lang, seq_id): the packed text, its
    * token count, and a `spans` map ("doc:offset:len", space-joined, in
    * position order) — the metadata a trainer needs to reset attention
    * masks at document boundaries and the auditor needs to reconstruct
    * any document from its pieces.
    *
    * Scale shape: the per-language token offsets are a range-exchange
    * prefix sum ([[graft.operators.RankOps.runningSumPer]]) over the
    * NARROW (doc_id, lang, n) projection — never a
    * `Window.partitionBy(lang)` running sum, which would funnel a
    * mega-language's entire corpus (60%-English crawls are the norm)
    * through ONE task's sort. The offsets join back to the tokenized
    * corpus on doc_id (text crosses the wire once, there), a document
    * explodes into only the ⌈n/seqLen⌉+1 sequences it intersects,
    * piece slicing is row-local on the token array, and the final
    * assembly groups on (lang, seq_id) — sequence-sized groups,
    * map-side combined. `PackPlanSpec` pins the no-corpus-window shape
    * and row-identity with the windowed form on a skewed-lang fixture. */
  def packSequences(docs: DataFrame, seqLen: Long): DataFrame = {
    val L = seqLen
    val toks = when(length(trim(col("text"))) === 0,
        expr("cast(array() as array<string>)"))
      .otherwise(split(trim(lower(col("text"))), "\\s+"))
    // prefix sums over narrow rows only: tokenizing twice (here for n,
    // below for the slicing) costs one extra codegen pass over text
    // already being scanned; carrying the token arrays through the
    // range exchange + checkpoint pin would cost corpus-text I/O twice
    val narrow = docs.select(col("doc_id"), col("lang"), toks.as("t"))
      .select(col("doc_id"), col("lang"), size(col("t")).cast("long").as("n"))
      .filter(col("n") > 0)
    val cum = graft.operators.RankOps
      .runningSumPer(narrow, "lang", Seq(col("doc_id").asc), "n", "endp")
      .withColumn("startp", col("endp") - col("n"))
      .select("doc_id", "startp", "endp")
    val pieces = docs.select(col("doc_id"), col("lang"), toks.as("t"))
      .join(cum, "doc_id") // inner: re-drops the n=0 docs cum filtered
      .select(col("doc_id"), col("lang"), col("t"), col("startp"), col("endp"),
        explode(expr(s"sequence(startp div $L, (endp - 1) div $L)")).as("seq_id"))
      .withColumn("pa", greatest(col("startp"), col("seq_id") * L))
      .withColumn("pb", least(col("endp"), (col("seq_id") + 1) * L))
      .withColumn("piece", expr(
        "array_join(slice(t, cast(pa - startp + 1 as int), " +
          "cast(pb - pa as int)), ' ')"))
    pieces.groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pb") - col("pa")).as("n_tokens"),
        expr("array_join(transform(array_sort(collect_list(" +
          "named_struct('pa', pa, 'piece', piece))), x -> x.piece), ' ')")
          .as("text_packed"),
        expr(s"array_join(transform(array_sort(collect_list(named_struct(" +
          s"'pa', pa, 'sp', concat_ws(':', doc_id, pa - seq_id * $L, " +
          s"pb - pa)))), x -> x.sp), ' ')").as("spans"))
  }

  /** The single-partition-window form of [[packSequences]]'s offset
    * computation, kept ONLY as the test twin: `PackPlanSpec` asserts
    * row-identity between this and the range-exchange production path
    * on a skewed-lang fixture. Never call it on a real corpus — the
    * lang window funnels each language through one task. */
  private[graft] def packSequencesWindowedOffsets(docs: DataFrame): DataFrame = {
    val toks = when(length(trim(col("text"))) === 0,
        expr("cast(array() as array<string>)"))
      .otherwise(split(trim(lower(col("text"))), "\\s+"))
    val w = Window.partitionBy("lang").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("lang"), toks.as("t"))
      .select(col("doc_id"), col("lang"), size(col("t")).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("endp", sum("n").over(w))
      .withColumn("startp", col("endp") - col("n"))
      .select("doc_id", "lang", "startp", "endp")
  }

  /** q132's sequence length — interpolated into BOTH the Spark call and
    * the DuckDB oracle SQL so the two can never drift (the q130
    * BenchEmit/BenchContaminated convention). */
  val PackSeqLen: Long = 2048L

  /** [[packSequences]] at seqLen=[[PackSeqLen]] over the documents
    * table — the oracle checks the packed text and span metadata
    * byte-for-byte. */
  def q132PackSequences(s: SparkSession, dir: String): DataFrame =
    packSequences(t(s, dir, "documents"), PackSeqLen)

  /** Top-20 bigrams by count with pointwise mutual information — the
    * collocation statistic behind phrase mining / tokenizer merges.
    * Bigrams come from a higher-order transform over the token array
    * (codegen, no UDF); the unigram joins are size-gated on the pinned
    * table's count (broadcast small, sort-merge at crawl vocab scale). */
  def q60BigramPmi(s: SparkSession, dir: String): DataFrame =
    q60BigramPmi(s, dir, graft.operators.DedupOps.BroadcastRowLimit)

  private[graft] def q60BigramPmi(s: SparkSession, dir: String,
      rowLimit: Long): DataFrame = {
    val docs = t(s, dir, "documents")
    val arr = docs.select(split(trim(lower(col("text"))), "\\s+").as("a"))
      .filter(size(col("a")) >= 2 && length(element_at(col("a"), 1)) > 0)
    val bi = arr.select(explode(expr(
      "transform(sequence(1, size(a) - 1), " +
        "i -> named_struct('x', element_at(a, i), 'y', element_at(a, i + 1)))"))
      .as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
    // pair counts are vocabulary²-bounded where the raw bigram stream is
    // corpus-sized: aggregate FIRST, then derive the bigram total from the
    // counts — the corpus-sized stream is scanned once and never
    // checkpointed, and the total costs a sum over the (small) pair table
    // instead of a second corpus scan
    val pairs = bi.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .pin()
    val uni = tokens(docs).groupBy(col("tok")).agg(count(lit(1)).as("c"))
      // every broadcast hint on this pin rides gateKnown under its own
      // count (nUni below) — the registered size-gated discipline
      .pin("size-gated")
    // the vocabulary is open-ended, so BOTH unigram joins are
    // size-gated on the pinned table's count (free once pinned):
    // broadcast on typical corpora, deterministic sort-merge when a
    // crawl-scale distinct-token table would blow the driver
    val nUni = uni.count()
    import graft.operators.DedupOps.gateKnown
    // sum over zero rows is null (empty corpus / all-blank texts) — same
    // guard as q47's trigram total
    val totUni = Option(uni.agg(sum("c")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L).toDouble
    val totBi = Option(pairs.agg(sum("c_xy")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L).toDouble
    pairs
      .join(gateKnown(uni.select(col("tok").as("x"), col("c").as("c_x")),
        nUni, rowLimit), "x")
      .join(gateKnown(uni.select(col("tok").as("y"), col("c").as("c_y")),
        nUni, rowLimit), "y")
      .withColumn("pmi", round(
        log((col("c_xy") / lit(totBi)) /
          ((col("c_x") / lit(totUni)) * (col("c_y") / lit(totUni)))), 4))
      .select("x", "y", "c_xy", "pmi")
      .orderBy(col("c_xy").desc, col("x").asc, col("y").asc)
      .limit(20)
  }

  /** Deterministic stratified sampling: per-language keep rates in
    * sixteenths of the md5 nibble space (en 16/16, es 12/16, de 8/16,
    * zh 4/16, rest 2/16). Like q52's split, membership is a pure function
    * of the row key — reproducible across runs and engines, no stored
    * sample table, one embarrassingly-parallel filter. */
  def q61StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val nib = substring(
      md5(concat(lit("smp"), col("doc_id").cast("string")).cast("binary")), 1, 1)
    t(s, dir, "documents")
      .filter(
        when(col("lang") === "en", lit(true))
          .when(col("lang") === "es", nib < "c")
          .when(col("lang") === "de", nib < "8")
          .when(col("lang") === "zh", nib < "4")
          .otherwise(nib < "2"))
      .select(col("doc_id"), col("lang"))
  }

  /** Training-mixture planner — the data-mixing step before a training
    * run: published recipes reweight DOMAINS toward a target mixture
    * rather than sampling the crawl proportionally (Gopher/LLaMA-style
    * mixtures). Per source: token mass, natural share, equal-domain
    * target share, and the keep-rate (downsample) or epoch factor
    * (upsample) that hits alloc = budget/|sources| with budget = half
    * the corpus tokens. One fact scan → per-source agg; the mixture
    * table is |sources| rows — broadcastable at any corpus scale, and
    * exactly what q61-style deterministic samplers consume as rates. */
  def q75MixturePlan(s: SparkSession, dir: String): DataFrame = {
    val perSrc = t(s, dir, "documents")
      .select(col("source"), gf.token_count(col("text")).cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"))
    val tot = perSrc.agg(sum("tokens").cast("double").as("total"),
      count(lit(1)).cast("double").as("n_src"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("tokens") / col("total"), 6).as("share"),
        round(lit(1.0) / col("n_src"), 6).as("target_share"),
        round(least(lit(1.0),
          (col("total") * 0.5 / col("n_src")) / col("tokens")), 6).as("keep_rate"),
        round((col("total") * 0.5 / col("n_src")) / col("tokens"), 6).as("epochs"))
  }

  /** Dedup impact report over the exact-dedup relation (q18's
    * fingerprint grouping): cluster-size histogram + how many documents
    * a keep-one policy removes at each size. The histogram is ≤ max
    * cluster size rows — the fleet-wide "how much did dedup save"
    * number, computed without materializing the dedup itself. */
  def q76DedupImpact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"))
      .groupBy(col("n_copies"))
      .agg(count(lit(1)).as("n_clusters"),
        (sum(col("n_copies")) - count(lit(1))).as("docs_removed"))

  /** Model-based quality filtering — the fasttext-shaped step pipelines
    * run AFTER heuristic gates (q30/q46): a linear classifier over
    * hashed token features, scored entirely ROW-LOCALLY (one map pass,
    * zero shuffle, no broadcast — the weight of a token is a pure
    * function of its hash, standing in for a lookup into a broadcast
    * weight vector; swapping in trained weights keeps the exact same
    * plan with one broadcast join added).
    *
    * Cross-engine exactness by construction: each token weight
    * (hex(md5)₄ − 32768)/32768 is an exact binary fraction, so the
    * double sum is order-independent and bit-equal in Spark and DuckDB;
    * the score avoids transcendental functions (no sigmoid — the
    * monotone mean-weight decides, same decision boundary). */
  def q78QualityClassifier(s: SparkSession, dir: String): DataFrame =
    scoreQuality(t(s, dir, "documents"))
      .select("doc_id", "n_toks", "qscore", "keep")

  /** The q78 scorer as a reusable transform: appends n_toks / qscore /
    * keep to any frame with a `text` column. Pure row-local map — no
    * shuffle, no state — so it applies unchanged to a STREAMING frame
    * ([[graft.streaming.Streams.qualityGate]]). */
  private[graft] def scoreQuality(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk",
        expr("""filter(split(trim(lower(text)), '\\s+'), t -> length(t) > 0)"""))
      .withColumn("n_toks", size(col("tk")))
      .withColumn("wsum",
        expr("""aggregate(tk, CAST(0.0 AS DOUBLE), (acc, t) ->
            acc + (CAST(conv(substring(md5(t), 1, 4), 16, 10) AS BIGINT) - 32768D)
                  / 32768D)"""))
      .withColumn("qscore",
        when(col("n_toks") > 0, round(col("wsum") / col("n_toks"), 6))
          .otherwise(0.0))
      .withColumn("keep", col("n_toks") > 0 && col("wsum") >= 0)
      .drop("tk", "wsum")

  /** Deterministic epoch shuffle + shard assignment — the step that
    * fixes training data ORDER: every doc gets a position in a
    * pseudo-random permutation (md5 of a seeded key — rerunning with a
    * different seed string is a new epoch, reproducible bit-for-bit on
    * any cluster size), a round-robin shard, and its index within the
    * shard. The permutation is a RANGE SHUFFLE on the hash key — md5 is
    * uniform, so partitions balance regardless of doc-id clustering —
    * and the global position comes from [[graft.operators.RankOps
    * .globalRowNumber]] (per-partition local index + broadcast offsets),
    * never a single-partition window: the one corpus-sized exchange is
    * the permutation itself, which is the job being asked for. Shard
    * and shard_pos are pure arithmetic on pos — no second shuffle. */
  def q79EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankOps
    val keyed = t(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("epoch0:"), col("doc_id"))).as("skey"))
    RankOps.globalRowNumber(keyed,
        Seq(col("skey").asc, col("doc_id").asc), "pos")
      .select(col("doc_id"), col("pos"),
        expr("CAST((pos - 1) % 8 AS INT)").as("shard"),
        expr("(pos - 1) DIV 8 + 1").as("shard_pos"))
  }

  /** Pre-dedup cardinality planning via HLL sketches: per source, the
    * approximate number of DISTINCT content fingerprints (what exact
    * dedup would keep) next to the raw doc count, plus the implied
    * duplicate fraction. `approx_count_distinct` is HyperLogLog++ — a
    * fixed few-KB MERGEABLE sketch per group, combined map-side, so the
    * estimate costs one scan plus a |sources|-row shuffle where exact
    * COUNT(DISTINCT fp) shuffles every fingerprint in the corpus. This
    * is the 100 TB "how much will dedup save, per source" planning
    * number: cheap enough to run on every snapshot, accurate to the
    * configured rsd (0.5% here; estimator is deterministic — same data,
    * same estimate). No DuckDB oracle — the estimate is engine-specific
    * (driver records rows-only; SketchSpec pins observed error <2% vs
    * exact and partial-merge planning). */
  def q80CardinalitySketch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp"), 0.005).as("approx_distinct"))
      .withColumn("dup_frac",
        round(lit(1.0) - col("approx_distinct") / col("n_docs"), 4))

  /** Sequence-length quantiles per language — the planning input for
    * packing (q59 needs a bin size ≥ the typical doc) and for truncation
    * budgets, computed with `percentile_approx`'s Greenwald-Khanna
    * summaries: bounded-size MERGEABLE sketches with a rank-error
    * guarantee of n/accuracy, combined map-side like q80's HLL — the
    * exact quantile would SORT the corpus per language. Rank error at
    * accuracy 10k is ≤0.01% of rows; SketchSpec asserts the guarantee
    * against driver-side exact ranks (no DuckDB oracle — GK picks one
    * of the rank-feasible elements, an engine-specific choice). */
  def q81LengthQuantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), gf.token_count(col("text")).cast("double").as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        percentile_approx(col("toks"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      .select(col("lang"), col("n_docs"),
        element_at(col("qs"), 1).cast("int").as("p50_toks"),
        element_at(col("qs"), 2).cast("int").as("p90_toks"),
        element_at(col("qs"), 3).cast("int").as("p99_toks"))

  /** Exact φ-frequent tokens (φ = 1/(k+1), k = 31) via a two-pass
    * Misra-Gries sketch: pass 1 builds a size-k MG summary PER PARTITION
    * ([[graft.functions.MisraGries]]) and unions the surviving keys — by
    * the MG guarantee (and pigeonhole across partitions: if an item's
    * global count exceeds n/(k+1) = Σnₚ/(k+1), some partition has it
    * above its local nₚ/(k+1)) this union is a SUPERSET of every
    * φ-frequent token, with ≤ k·partitions entries — bounded by cluster
    * parallelism, never by data, so collecting it to the driver is
    * legitimate. Pass 2 exactly counts ONLY the candidates (IN-filter
    * pushed to the scan) and keeps those above threshold: output is
    * exact and deterministic — the sketch only pruned the shuffle, which
    * carries ≤ k·partitions distinct keys instead of the whole
    * vocabulary. The q38 vocabulary build is the exact-everything twin;
    * this is the shape for vocabularies too large to shuffle whole. */
  def q83FrequentTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 31
    val toks = tokens(t(s, dir, "documents"))
    val cands = toks.select("tok").as[String]
      .mapPartitions { it =>
        val mg = new graft.functions.MisraGries(k)
        mg.addAll(it).candidates
      }
      .distinct().collect().toSeq.sorted // ≤ k·partitions rows
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.filter(col("tok").isin(cands: _*))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * (k + 1) > col("n_total"))
      .select(col("tok"), col("freq"),
        round(col("freq") / col("n_total"), 6).as("frac"))
  }

  /** Reproducible weighted document sample (expected size 200, weight =
    * n_chars): include a doc iff u/2^32 < k*w/W, with u the first 32
    * md5 bits of the seeded doc_id — the Bernoulli twin of
    * [[graft.operators.WeightedSample]]'s exact-k A-ES sampler, kept
    * integer-exact so the oracle hash-matches: the comparison is
    * u*W < k*w*2^32 in decimal(38) space, which holds exactly even at
    * 100 TB weight sums (u < 2^32, W < 10^15 → product < 10^25 « 10^38;
    * doubles would break ties at the margin, and engines' pow/log ulp
    * differences would flip membership). One scan + one broadcast
    * single-row total; row-local decision, no shuffle. */
  def q85WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val u = conv(substring(
        md5(concat(lit("ws"), col("doc_id").cast("string")).cast("binary")),
        1, 8), 16, 10).cast("long")
    val tot = d.agg(sum("n_chars").cast("decimal(38,0)").as("tw"))
    d.select(col("doc_id"), col("lang"), col("n_chars").as("w"), u.as("u"))
      .crossJoin(broadcast(tot))
      .filter(col("u").cast("decimal(38,0)") * col("tw") <
        lit(200).cast("decimal(38,0)") * col("w") * lit(4294967296L))
      .select("doc_id", "lang", "w")
  }

  /** Snapshot diff — the incremental-crawl step: classify every doc as
    * added / removed / changed between two corpus versions and emit the
    * delta work-list (unchanged rows are dropped — at 100 TB the output
    * is churn-sized, not corpus-sized). The versions are derived
    * deterministically from the one test table (old skips doc_id%7==0
    * and perturbs text for %5==0; new skips %11==0), but the SHAPE is
    * the production one: fingerprints are computed row-local at the
    * scan, the full-outer join carries only (doc_id, 32-byte fp) —
    * document text never crosses the wire — and both sides shuffle
    * once on the id key. */
  def q86SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    // plain load, NOT the loadP parallelism floor: loadP's repartition
    // would sit below the fingerprint projection and push corpus TEXT
    // through its exchange — here the md5 must collapse into the scan
    // side so only (doc_id, fp) reaches the join shuffle (the join's
    // own hash exchange is the first and only wire crossing)
    val docs = Tables.load(s, dir, "documents")
    val prev = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .select(col("doc_id"),
        md5(when(pmod(col("doc_id"), lit(5)) === 0,
            expr("substring(text, 2)")).otherwise(col("text"))
          .cast("binary")).as("old_fp"))
    val cur = docs.filter(pmod(col("doc_id"), lit(11)) =!= 0)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("new_fp"))
    prev.join(cur, Seq("doc_id"), "full")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"),
        coalesce(col("old_fp"), lit("")).as("old_fp"),
        coalesce(col("new_fp"), lit("")).as("new_fp"))
  }

  /** DSIR-style importance evidence (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc by
    * how much its hashed-unigram distribution resembles a TARGET domain
    * (lang='en' here, standing in for the curated target corpus) versus
    * the raw corpus. Tokens hash into 4096 buckets (portable md5 nibble
    * hash, q78's trick), so the whole target/raw contrast compresses to
    * a ≤4096-row dim table — broadcast, independent of corpus size; the
    * per-doc aggregation shuffles only (doc_id, partial-sum) rows. The
    * token stream feeds the dim build and the scoring join — recomputed,
    * not checkpointed (q57's policy: one extra scan beats pinning a
    * corpus-sized intermediate in the block manager).
    *
    * Emits the INTEGER-EXACT per-doc evidence (feature count, summed
    * target/raw bucket counts) — oracle-checked; the transcendental
    * log-ratio itself is [[dsirScore]], spec-gated against a driver-side
    * recompute (ln can never hash-match across engines — q85 pattern). */
  def q88DsirEvidence(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("int"))
    val dim = toks.groupBy("bucket").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_cnt"),
      count(lit(1)).as("raw_cnt"))
    val per = toks.join(broadcast(dim), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum("tgt_cnt").as("tgt_hits"),
        sum("raw_cnt").as("raw_hits"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("tgt_hits"), lit(0L)).as("tgt_hits"),
        coalesce(col("raw_hits"), lit(0L)).as("raw_hits"))
  }

  /** The DSIR log-likelihood-ratio score over q88's bucket statistics:
    * per doc, Σ_tokens [ln(tgt_cnt(b)+1) − ln(raw_cnt(b)+1)]
    * + n_feats·ln((R+B)/(T+B)) — the add-one-smoothed ln p̂_tgt/p̂_raw of
    * the doc's hashed features. Same plan as q88 (broadcast dim, one
    * doc_id shuffle); the corpus totals (T, R) ride a 1-row broadcast.
    * Spec-gated (DsirSpec): exact parity with a driver-side recompute
    * plus the separation property (target-domain docs score higher).
    * Importance RESAMPLING is composition: feed exp(score/τ) into
    * [[graft.operators.WeightedSample]]. */
  def dsirScore(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("int"))
    val dim = toks.groupBy("bucket").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_cnt"),
      count(lit(1)).as("raw_cnt"))
    val totals = dim.agg(
      (sum("tgt_cnt") + lit(4096L)).cast("double").as("t_norm"),
      (sum("raw_cnt") + lit(4096L)).cast("double").as("r_norm"))
    val per = toks.join(broadcast(dim), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(log(col("tgt_cnt") + 1) - log(col("raw_cnt") + 1)).as("lsum"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("lsum") + col("n_feats") * log(col("r_norm") / col("t_norm")),
          lit(0.0)).as("dsir_score"))
  }

  /** Leakage-safe train/val/test split — the fix for the classic eval
    * bug q52's per-doc split cannot see: two near-duplicate documents
    * landing on opposite sides of the train/test fence leak training
    * content into the benchmark. The split key is the near-dup CLUSTER
    * canon (connected components over the exact-Jaccard ≥ 0.8 pair
    * graph, min doc_id per component), so a whole cluster moves as one
    * unit and no q22 pair can ever straddle splits (property pinned in
    * CurationExtrasSpec). Scale: components run on the PAIR graph only
    * (ids, not documents — DedupOps' adaptive union-find); the label
    * table is duplicate-clusters-sized ≪ corpus on typical corpora but
    * approaches corpus size on dup-heavy crawls (30-60% duplicate is
    * the norm), so the join back onto the doc scan is SIZE-GATED on
    * the component count the union-find already knows — broadcast
    * small, sort-merge large — and the split itself stays a pure
    * row-local md5-nibble map, same rule as q52. */
  def q107LeakageSafeSplit(s: SparkSession, dir: String): DataFrame =
    q107LeakageSafeSplit(s, dir, graft.operators.DedupOps.BroadcastRowLimit)

  private[graft] def q107LeakageSafeSplit(s: SparkSession, dir: String,
      rowLimit: Long): DataFrame = {
    val pairs = DedupQueries.q22JaccardNeardup(s, dir)
    val (comps, nNodes) = graft.operators.DedupOps
      .connectedComponentsCounted(pairs, "doc_a", "doc_b")
    val nib = substring(
      md5(col("canon_id").cast("string").cast("binary")), 1, 1)
    t(s, dir, "documents").select(col("doc_id"))
      .join(graft.operators.DedupOps.gateKnown(comps, nNodes, rowLimit),
        col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("canon_id"))
      .select(col("doc_id"), col("canon_id"),
        when(nib.isin("c", "d"), "val")
          .when(nib.isin("e", "f"), "test")
          .otherwise("train").as("split"))
  }

  /** Batch-padding waste report — the batching planner's cost model:
    * docs are bucketed by length (q54's power-of-two-ish bands), sorted
    * long-first inside each (lang, bucket) lane, and cut into batches of
    * 32; every batch pads its members to the batch max, and the report
    * says how many pad tokens each lane burns vs the used tokens. The
    * per-lane ranking goes through RankOps.globalRowNumberPer — ONE
    * range exchange ranks every lane in parallel, no per-lane
    * single-task window, so the plan survives a corpus where one lane
    * holds billions of rows. The batch rollup is map-side combinable. */
  def q108PaddingWaste(s: SparkSession, dir: String): DataFrame = {
    val toks = gf.token_count(col("text")).cast("long")
    val bucket = when(toks === 0, "0")
      .when(toks < 32, "001-031")
      .when(toks < 64, "032-063")
      .when(toks < 128, "064-127")
      .when(toks < 256, "128-255")
      .when(toks < 512, "256-511")
      .otherwise("512+")
    val lanes = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), toks.as("toks"), bucket.as("bucket"))
      .withColumn("lane", concat_ws("|", col("lang"), col("bucket")))
    val ranked = graft.operators.RankOps.globalRowNumberPer(
      lanes, "lane", Seq(col("toks").desc, col("doc_id").asc), "rk")
    ranked
      .withColumn("batch", floor((col("rk") - 1) / 32))
      .groupBy(col("lang"), col("bucket"), col("batch"))
      .agg(max("toks").as("mx"), count(lit(1)).as("cnt"), sum("toks").as("st"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_batches"),
        sum("cnt").as("n_docs"),
        sum(col("mx") * col("cnt") - col("st")).as("pad_tokens"),
        sum("st").as("used_tokens"))
  }

  /** Quality-cutoff sweep — "what survives if I cut at score X": docs
    * and tokens binned by q30's rounded quality score into tenth-bands,
    * with DESCENDING cumulative kept_docs/kept_tokens per band, i.e. the
    * corpus left at each candidate threshold. One scan, one bounded
    * groupBy; the cumulative window runs over ≤ 11 band rows (constant
    * partition key per the repo's bounded-window convention). */
  def q109QualityCutoffs(s: SparkSession, dir: String): DataFrame = {
    val q = round(graft.PipelineQueries.qualityExpr(col("text")), 4)
    val band = least(floor(q * 10), lit(9.0)).cast("int")
    val toks = gf.token_count(col("text")).cast("long")
    val perBand = t(s, dir, "documents")
      .select(band.as("band"), toks.as("toks"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    val w = Window.partitionBy(gf.one_partition(col("band")))
      .orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBand
      .withColumn("kept_docs", sum("n_docs").over(w))
      .withColumn("kept_tokens", sum("n_tokens").over(w))
      .select(round(col("band") / 10.0, 1).as("cutoff"),
        col("n_docs"), col("n_tokens"), col("kept_docs"), col("kept_tokens"))
  }

  /** Temperature-scaled sampling mixture — the multilingual rebalancing
    * rule of XLM-R (Conneau et al. 2020 §3.1) and mT5 (Xue et al. 2021
    * §3.2): sample language l with p_l ∝ (tokens_l)^α, α = 0.3, which
    * flattens the head languages and boosts the tail without q75's hard
    * equal-share target. Per language: natural share, the temperature
    * probability, and the boost factor p/share a sampler applies.
    * Everything after the per-language aggregate is |langs|-sized —
    * one corpus scan with map-side partial sums, then a 1-row broadcast
    * of (total, Σ tokens^α); transcendental pow is applied to exact
    * integer token counts so both engines see identical inputs. */
  def q110TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val perLang = t(s, dir, "documents")
      .select(col("lang"), gf.token_count(col("text")).cast("long").as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"))
    val tot = perLang.agg(sum("tokens").cast("double").as("total"),
      sum(pow(col("tokens").cast("double"), 0.3)).as("z"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("tokens"),
        round(col("tokens") / col("total"), 6).as("share"),
        round(pow(col("tokens").cast("double"), 0.3) / col("z"), 6)
          .as("p_sample"),
        round(pow(col("tokens").cast("double"), 0.3) / col("z") /
          (col("tokens") / col("total")), 6).as("boost"))
  }

  /** Mixture APPLICATION — materialize q75's per-source plan as actual
    * training rows: every document of source s appears floor(e_s) times
    * plus one more with probability frac(e_s), where e_s is the source's
    * epoch factor (downsampled sources have e_s < 1, so this IS the
    * keep-rate filter and the upsampler in one rule). The fractional
    * coin is the q85 trick made integer-exact: with T = corpus tokens,
    * k = 2·n_src, den = k·tokens_s, a doc takes the extra copy iff
    * u·den < 2^32·(T mod den) with u a 32-bit md5 uniform of doc_id —
    * decimal(38) products, no double ever compared, so membership is
    * reproducible bit-for-bit across engines and runs (deterministic
    * re-export = the trainer can re-derive any shard).
    *
    * Scale shape: the rate table is |sources| rows built from a
    * broadcast 1-row total; the corpus path is scan → broadcast hash
    * join → row-local explode(sequence) — the fact table never
    * shuffles, and the fan-out per row is the planned epoch factor,
    * never unbounded. */
  def q111MixtureApply(s: SparkSession, dir: String): DataFrame =
    applyMixture(t(s, dir, "documents").select(col("doc_id"), col("source")),
      mixtureRates(s, dir))
      .select("doc_id", "source", "copy")

  /** The |sources|-row mixture rate table (base copies, fractional
    * remainder, denominator) the q111 rule consumes — built from one
    * partial-agg corpus scan and a broadcast 1-row total. Public so the
    * mixture-aware shard export feeds the SAME plan the oracle gates. */
  def mixtureRates(s: SparkSession, dir: String): DataFrame =
    mixtureRatesOf(t(s, dir, "documents"))

  /** [[mixtureRates]] over an arbitrary doc frame (doc_id + text +
    * source) — the curated-export lifecycle plans its mixture over the
    * SURVIVOR corpus, not the raw one: rates from pre-dedup token
    * masses would re-inflate exactly the sources dedup just trimmed. */
  def mixtureRatesOf(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source"), gf.token_count(col("text")).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("tokens"))
    val tot = perSrc.agg(sum("tokens").as("t_total"),
      (count(lit(1)) * 2).as("k"))
    perSrc.crossJoin(broadcast(tot))
      .selectExpr("source",
        "t_total div (k * tokens) AS base",
        "t_total % (k * tokens) AS rem",
        "k * tokens AS den")
  }

  /** q111's integer-exact materialization rule over an ARBITRARY doc
    * frame (must carry doc_id + source): floor(e) copies per doc plus
    * the u·den < 2^32·rem fractional-epoch extra — deterministic and
    * bit-reproducible, living ONCE so q111 and the mixture-aware shard
    * export ([[graft.sources.TrainingExport.exportMixedShards]]) cannot
    * drift. Keeps every input column and adds `copy`; the rate table
    * broadcasts and the fan-out per row is the planned epoch factor. */
  def applyMixture(docs: DataFrame, rates: DataFrame): DataFrame = {
    val u = conv(substring(
        md5(concat(lit("mix"), col("doc_id").cast("string")).cast("binary")),
        1, 8), 16, 10).cast("long")
    docs.join(broadcast(rates), "source")
      .withColumn("n_copies", col("base") +
        when(u.cast("decimal(38,0)") * col("den") <
          col("rem").cast("decimal(38,0)") * lit(4294967296L), 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(expr("sequence(CAST(1 AS BIGINT), n_copies)")))
      .drop("base", "rem", "den", "n_copies")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_leakage_split" -> q107LeakageSafeSplit _,
    "q110_temperature_mix" -> q110TemperatureMix _,
    "q111_mixture_apply" -> q111MixtureApply _,
    "q108_padding_waste" -> q108PaddingWaste _,
    "q109_quality_cutoffs" -> q109QualityCutoffs _,
    "q56_inverted_index" -> q56InvertedIndex _,
    "q57_tfidf_topterms" -> q57TfidfTopterms _,
    "q58_pii_scrub" -> q58PiiScrub _,
    "q103_unicode_clean" -> q103UnicodeClean _,
    "q104_html_extract" -> q104HtmlExtract _,
    "q59_pack_plan" -> q59PackPlan _,
    "q132_pack_sequences" -> q132PackSequences _,
    "q60_bigram_pmi" -> q60BigramPmi _,
    "q61_stratified_sample" -> q61StratifiedSample _,
    "q75_mixture_plan" -> q75MixturePlan _,
    "q76_dedup_impact" -> q76DedupImpact _,
    "q78_quality_classifier" -> q78QualityClassifier _,
    "q79_epoch_shuffle" -> q79EpochShuffle _,
    "q80_cardinality_sketch" -> q80CardinalitySketch _,
    "q81_length_quantiles" -> q81LengthQuantiles _,
    "q83_frequent_tokens" -> q83FrequentTokens _,
    "q85_weighted_sample" -> q85WeightedSample _,
    "q86_snapshot_diff" -> q86SnapshotDiff _,
    "q88_dsir_evidence" -> q88DsirEvidence _
  )

  private val tokCte: String =
    """tk AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |    FROM documents WHERE length(trim(text)) > 0)
      |  WHERE length(tok) > 0)""".stripMargin

  private val idxTermList = IDX_TERMS.map(t => s"'$t'").mkString(", ")

  val oracle: Map[String, String] = Map(
    "q107_leakage_split" ->
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
         |canon AS (
         |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS canon_id
         |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
         |SELECT doc_id, canon_id,
         |  CASE WHEN substr(md5(CAST(canon_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
         |       WHEN substr(md5(CAST(canon_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
         |       ELSE 'train' END AS split
         |FROM canon""".stripMargin,
    "q108_padding_waste" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, toks,
        |    CASE WHEN toks = 0 THEN '0'
        |      WHEN toks < 32 THEN '001-031'
        |      WHEN toks < 64 THEN '032-063'
        |      WHEN toks < 128 THEN '064-127'
        |      WHEN toks < 256 THEN '128-255'
        |      WHEN toks < 512 THEN '256-511'
        |      ELSE '512+' END AS bucket
        |  FROM t),
        |r AS (
        |  SELECT lang, bucket, toks,
        |    row_number() OVER (PARTITION BY lang, bucket
        |                       ORDER BY toks DESC, doc_id) AS rk
        |  FROM b),
        |g AS (
        |  SELECT lang, bucket, CAST(floor((rk - 1) / 32.0) AS BIGINT) AS batch,
        |    max(toks) AS mx, count(*) AS cnt, CAST(sum(toks) AS BIGINT) AS st
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT lang, bucket,
        |  count(*) AS n_batches,
        |  CAST(sum(cnt) AS BIGINT) AS n_docs,
        |  CAST(sum(mx * cnt - st) AS BIGINT) AS pad_tokens,
        |  CAST(sum(st) AS BIGINT) AS used_tokens
        |FROM g GROUP BY 1, 2""".stripMargin,
    "q109_quality_cutoffs" ->
      """WITH scored AS (
        |  SELECT round(CASE WHEN len = 0 OR toks = 0 THEN 0.0
        |    ELSE (lenScore + alphaScore + punctScore + wordScore) / 4.0 END, 4) AS q,
        |    CAST(toks AS BIGINT) AS toks
        |  FROM (
        |    SELECT len, toks,
        |      CASE WHEN len >= 100 AND len <= 20000 THEN 1.0
        |           WHEN len >= 20 THEN 0.5 ELSE 0.0 END AS lenScore,
        |      CASE WHEN alphaRatio >= 0.6 THEN 1.0 ELSE alphaRatio / 0.6 END AS alphaScore,
        |      CASE WHEN punctRatio <= 0.1 THEN 1.0
        |           ELSE greatest(0.0, 1.0 - (punctRatio - 0.1) * 5) END AS punctScore,
        |      CASE WHEN meanWord >= 3 AND meanWord <= 12 THEN 1.0 ELSE 0.5 END AS wordScore
        |    FROM (
        |      SELECT
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
        |      FROM documents)) ),
        |bands AS (
        |  SELECT CAST(least(floor(q * 10), 9.0) AS INT) AS band,
        |    count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
        |  FROM scored GROUP BY 1)
        |SELECT round(band / 10.0, 1) AS cutoff, n_docs, n_tokens,
        |  CAST(sum(n_docs) OVER (ORDER BY band DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_docs,
        |  CAST(sum(n_tokens) OVER (ORDER BY band DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_tokens
        |FROM bands""".stripMargin,
    "q56_inverted_index" ->
      s"""WITH $tokCte,
         |d AS (SELECT DISTINCT tok, doc_id FROM tk WHERE tok IN ($idxTermList))
         |SELECT tok, count(*) AS df,
         |  array_to_string(
         |    list_transform((list_sort(list(doc_id)))[1:20],
         |      x -> CAST(x AS VARCHAR)), ',') AS postings
         |FROM d GROUP BY tok""".stripMargin,
    "q57_tfidf_topterms" ->
      s"""WITH $tokCte,
         |n AS (SELECT count(*) AS n FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |sc AS (
         |  SELECT tf.doc_id, tf.tok,
         |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf
         |  FROM tf JOIN df USING (tok) CROSS JOIN n),
         |r AS (
         |  SELECT doc_id, tok, tfidf,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, tok ASC) AS rank
         |  FROM sc)
         |SELECT doc_id, CAST(rank AS INT) AS rank, tok, tfidf
         |FROM r WHERE rank <= 3""".stripMargin,
    "q58_pii_scrub" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or call 555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '555-[0-9]{4}')) AS INT) AS n_phones,
        |  md5(regexp_replace(
        |    regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp
        |FROM a""".stripMargin,
    "q104_html_extract" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc </title><style>body { color: red }</style></head><body><h1 class="hd">Doc &amp; heading</h1><p>'
        |    || text ||
        |    '</p><script type="text/javascript">var x = ' || CAST(doc_id AS VARCHAR) ||
        |    '; alert(x)</script><div>tail &lt;quote&gt; &#39;q&#39;</div></body></html>' AS aug
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      regexp_replace(
        |      regexp_replace(
        |      regexp_replace(
        |      regexp_replace(
        |      regexp_replace(
        |      regexp_replace(
        |      regexp_replace(
        |      regexp_replace(aug, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<', 'g'),
        |      '&gt;', '>', 'g'),
        |      '&#39;', '''', 'g'),
        |      '&quot;', '"', 'g'),
        |      '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM a)
        |SELECT doc_id, CAST(length(clean) AS INT) AS len_clean,
        |  md5(clean) AS clean_fp
        |FROM e""".stripMargin,
    "q103_unicode_clean" ->
      """WITH a AS (
        |  SELECT doc_id, text ||
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN ' cafe' || chr(769)
        |      WHEN 1 THEN ' A' || chr(778) || 'ngstrom'
        |      WHEN 2 THEN ' to' || chr(776) || 'ne'
        |      ELSE ' man' || chr(771) || 'ana'
        |    END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(aug) AS INT) AS len_raw,
        |  CAST(length(nfc_normalize(aug)) AS INT) AS len_nfc,
        |  md5(nfc_normalize(aug)) AS nfc_fp
        |FROM a""".stripMargin,
    "q59_pack_plan" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, toks,
        |    sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, CAST((cum - toks) // $PackSeqLen AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q132_pack_sequences" ->
      // the windowed sum(n) must be cast to BIGINT: DuckDB types it
      // HUGEINT and generate_series has no HUGEINT overload (the cast
      // also keeps startp/pa/pb BIGINT, protecting the slice bounds)
      s"""WITH toks AS (
        |  SELECT doc_id, lang, CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS t
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, lang, t, CAST(len(t) AS BIGINT) AS n
        |  FROM toks WHERE len(t) > 0),
        |c AS (
        |  SELECT *, CAST(sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS endp
        |  FROM d),
        |sp AS (
        |  SELECT doc_id, lang, t, endp - n AS startp, endp,
        |    unnest(generate_series((endp - n) // $PackSeqLen,
        |      (endp - 1) // $PackSeqLen)) AS seq_id
        |  FROM c),
        |p AS (
        |  SELECT doc_id, lang, seq_id, startp, t,
        |    greatest(startp, seq_id * $PackSeqLen) AS pa,
        |    least(endp, (seq_id + 1) * $PackSeqLen) AS pb
        |  FROM sp),
        |pc AS (
        |  SELECT doc_id, lang, seq_id, pa, pb,
        |    array_to_string(t[(pa - startp + 1):(pb - startp)], ' ') AS piece
        |  FROM p)
        |SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(pb - pa) AS BIGINT) AS n_tokens,
        |  string_agg(piece, ' ' ORDER BY pa) AS text_packed,
        |  string_agg(doc_id || ':' || (pa - seq_id * $PackSeqLen) || ':' ||
        |    (pb - pa), ' ' ORDER BY pa) AS spans
        |FROM pc GROUP BY lang, seq_id""".stripMargin,
    "q60_bigram_pmi" ->
      """WITH arr AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS a
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
        |    AND length(trim(text)) > 0),
        |bi AS (
        |  SELECT bg['x'] AS x, bg['y'] AS y FROM (
        |    SELECT unnest([struct_pack(x := a[i], y := a[i + 1])
        |      FOR i IN generate_series(1, len(a) - 1)]) AS bg
        |    FROM arr)),
        |uni AS (
        |  SELECT tok, count(*) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE length(trim(text)) > 0)
        |  WHERE length(tok) > 0 GROUP BY tok),
        |tot AS (
        |  SELECT CAST((SELECT sum(c) FROM uni) AS DOUBLE) AS tot_uni,
        |         CAST((SELECT count(*) FROM bi) AS DOUBLE) AS tot_bi),
        |pairs AS (SELECT x, y, count(*) AS c_xy FROM bi GROUP BY x, y)
        |SELECT p.x, p.y, p.c_xy,
        |  round(ln((p.c_xy / t.tot_bi) /
        |    ((ux.c / t.tot_uni) * (uy.c / t.tot_uni))), 4) AS pmi
        |FROM pairs p
        |JOIN uni ux ON ux.tok = p.x
        |JOIN uni uy ON uy.tok = p.y
        |CROSS JOIN tot t
        |ORDER BY p.c_xy DESC, p.x ASC, p.y ASC LIMIT 20""".stripMargin,
    "q61_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    substr(md5('smp' || CAST(doc_id AS VARCHAR)), 1, 1) AS nib
        |  FROM documents)
        |WHERE CASE WHEN lang = 'en' THEN true
        |  WHEN lang = 'es' THEN nib < 'c'
        |  WHEN lang = 'de' THEN nib < '8'
        |  WHEN lang = 'zh' THEN nib < '4'
        |  ELSE nib < '2' END""".stripMargin,
    "q75_mixture_plan" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(tokens) AS DOUBLE) AS total,
        |         CAST(count(*) AS DOUBLE) AS n_src
        |  FROM per)
        |SELECT source, n_docs, CAST(tokens AS BIGINT) AS tokens,
        |  round(tokens / total, 6) AS share,
        |  round(1.0 / n_src, 6) AS target_share,
        |  round(least(1.0, (total * 0.5 / n_src) / tokens), 6) AS keep_rate,
        |  round((total * 0.5 / n_src) / tokens, 6) AS epochs
        |FROM per CROSS JOIN tot""".stripMargin,
    "q110_temperature_mix" ->
      """WITH per AS (
        |  SELECT lang, count(*) AS n_docs,
        |    sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS tokens
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(tokens) AS DOUBLE) AS total,
        |         sum(pow(CAST(tokens AS DOUBLE), 0.3)) AS z
        |  FROM per)
        |SELECT lang, n_docs, CAST(tokens AS BIGINT) AS tokens,
        |  round(tokens / total, 6) AS share,
        |  round(pow(CAST(tokens AS DOUBLE), 0.3) / z, 6) AS p_sample,
        |  round(pow(CAST(tokens AS DOUBLE), 0.3) / z / (tokens / total), 6) AS boost
        |FROM per CROSS JOIN tot""".stripMargin,
    "q111_mixture_apply" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(tokens) AS BIGINT) AS t_total,
        |         CAST(count(*) * 2 AS BIGINT) AS k
        |  FROM per),
        |rates AS (
        |  SELECT source,
        |    t_total // (k * tokens) AS base,
        |    t_total % (k * tokens) AS rem,
        |    k * tokens AS den
        |  FROM per CROSS JOIN tot),
        |withc AS (
        |  SELECT d.doc_id, d.source,
        |    r.base + CASE WHEN
        |      CAST(CAST(('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS HUGEINT) * r.den
        |        < CAST(r.rem AS HUGEINT) * 4294967296 THEN 1 ELSE 0 END AS n_copies
        |  FROM documents d JOIN rates r USING (source)),
        |sel AS (
        |  SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
        |  FROM withc WHERE n_copies > 0)
        |SELECT doc_id, source, CAST(copy AS BIGINT) AS copy FROM sel""".stripMargin,
    "q76_dedup_impact" ->
      """WITH cl AS (
        |  SELECT md5(lower(trim(text))) AS fp, count(*) AS n_copies
        |  FROM documents GROUP BY 1)
        |SELECT n_copies, count(*) AS n_clusters,
        |  CAST(sum(n_copies) - count(*) AS BIGINT) AS docs_removed
        |FROM cl GROUP BY n_copies""".stripMargin,
    "q78_quality_classifier" ->
      s"""WITH $tokCte,
         |w AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) - 32768 AS wv
         |  FROM tk),
         |agg AS (SELECT doc_id, count(*) AS n, sum(wv) AS s FROM w GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS INT) AS n_toks,
         |  CASE WHEN agg.n > 0
         |    THEN round(CAST(agg.s AS DOUBLE) / 32768.0 / agg.n, 6)
         |    ELSE 0.0 END AS qscore,
         |  coalesce(agg.n > 0 AND agg.s >= 0, false) AS keep
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    "q79_epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS pos
        |  FROM k)
        |SELECT doc_id, pos,
        |  CAST((pos - 1) % 8 AS INT) AS shard,
        |  (pos - 1) // 8 + 1 AS shard_pos
        |FROM r""".stripMargin,
    // exact-by-construction despite the sketch: the MG pass only prunes
    // candidates, so the oracle is the plain threshold aggregate
    "q83_frequent_tokens" ->
      s"""WITH $tokCte,
         |tot AS (SELECT count(*) AS n FROM tk)
         |SELECT tok, CAST(count(*) AS BIGINT) AS freq,
         |  round(count(*) * 1.0 / (SELECT n FROM tot), 6) AS frac
         |FROM tk GROUP BY tok
         |HAVING count(*) * 32 > (SELECT n FROM tot)""".stripMargin,
    // integer-exact membership: HUGEINT on the DuckDB side mirrors the
    // decimal(38) products on the Spark side, so the sampled set is
    // bit-identical by construction
    "q85_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars AS w,
        |    CAST(('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS u
        |  FROM documents),
        |tot AS (SELECT SUM(w) AS tw FROM d)
        |SELECT doc_id, lang, w FROM d, tot
        |WHERE CAST(u AS HUGEINT) * tw < CAST(200 AS HUGEINT) * w * 4294967296""".stripMargin,
    "q86_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN substr(text, 2) ELSE text END)
        |      AS old_fp
        |  FROM documents WHERE doc_id % 7 <> 0),
        |cur AS (
        |  SELECT doc_id, md5(text) AS new_fp
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT doc_id,
        |  CASE WHEN old_fp IS NULL THEN 'added'
        |       WHEN new_fp IS NULL THEN 'removed'
        |       WHEN old_fp <> new_fp THEN 'changed' END AS status,
        |  COALESCE(old_fp, '') AS old_fp,
        |  COALESCE(new_fp, '') AS new_fp
        |FROM prev FULL JOIN cur USING (doc_id)
        |WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp""".stripMargin,
    "q88_dsir_evidence" ->
      """WITH tkl AS (
        |  SELECT doc_id, lang, tok FROM (
        |    SELECT doc_id, lang,
        |      unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |    FROM documents WHERE length(trim(text)) > 0)
        |  WHERE length(tok) > 0),
        |bk AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(tok), 1, 3)) AS BIGINT) AS bucket
        |  FROM tkl),
        |dim AS (
        |  SELECT bucket,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_cnt,
        |    count(*) AS raw_cnt
        |  FROM bk GROUP BY bucket),
        |per AS (
        |  SELECT doc_id, count(*) AS n,
        |    sum(tgt_cnt) AS th, sum(raw_cnt) AS rh
        |  FROM bk JOIN dim USING (bucket) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(per.n, 0) AS BIGINT) AS n_feats,
        |  CAST(coalesce(per.th, 0) AS BIGINT) AS tgt_hits,
        |  CAST(coalesce(per.rh, 0) AS BIGINT) AS raw_hits
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin
  )
}
