package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{functions => F}

/** Public column-function surface of the engine ("graft functions").
  *
  * Codec / cosine are native Catalyst expressions (whole-stage codegen,
  * see expressions.scala); document/text functions are Scala UDFs (ingest
  * path, not per-row-hot in queries).
  */
object gf {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    shim.column(e)
  private def expr(c: Column) = shim.expression(c)

  // ---- vector codec + kernels (native expressions) ----

  /** Cosine similarity of two `array<float>` columns (float64 math). */
  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))

  /** Fused dequantize+cosine over two packed quantized `binary` vectors. */
  def cosine_sim_q(a: Column, b: Column): Column = col(CosineSimQ(expr(a), expr(b)))

  /** `array<float>` → packed quantized `binary(dim+8)` ([f32 min][f32 max][codes]). */
  def quantize_vec(a: Column): Column = col(QuantizeVec(expr(a)))

  /** Unicode NFC canonical composition of a string column. */
  def nfc_normalize(a: Column): Column = col(NfcNormalize(expr(a)))

  /** packed quantized `binary` → `array<float>`. */
  def dequantize_vec(a: Column): Column = col(DequantizeVec(expr(a)))

  /** L2-normalize an `array<float>` (zero-norm → zero vector). */
  def l2_normalize(a: Column): Column = col(L2Normalize(expr(a)))

  /** Deterministic fake embedding of a string (reference noop provider
    * shape: quantized binary, header min=-1/max=1). */
  def noop_embed(text: Column, dim: Int = 512): Column = col(NoopEmbed(expr(text), dim))

  /** Bounded top-k collect: per group, the `k` largest (smallest with
    * `reverse = true`) values of `e` under its natural ordering, as an
    * array. Wraps Catalyst's `CollectTopK` (a BoundedPriorityQueue
    * aggregate): the buffer is k-BOUNDED per key on both the map-side
    * partial and the merge, so a corpus-skewed hot key costs k·log k
    * per input row spread across ALL its partitions — the skew-safe
    * alternative to a per-key window row_number for keep-N-per-key
    * ([[graft.operators.RankOps.boundedUserHistory]]). `e` must be an
    * ORDERABLE type (struct fields compare lexicographically; no maps). */
  def collect_top_k(e: Column, k: Int, reverse: Boolean): Column =
    col(shim.collectTopK(expr(e), k, reverse))

  /** Probe a broadcast Bloom filter with a `bigint` hash column — the
    * pre-shuffle membership prune (see [[graft.DedupQueries]] q87). */
  def bloom_might_contain(
      h: Column,
      bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    col(BloomMightContain(expr(h), bf))

  // ---- document pipeline (UDFs) ----
  // Null policy: a null text behaves as EMPTY text (no tokens/shingles,
  // sentinel signatures) — Scala UDFs receive null Strings as-is and
  // would otherwise NPE; NullInputSpec sweeps the whole registry.

  /** JSON document → canonical flattened text (reference Flatten). */
  val flatten_doc: Column => Column = {
    val u = F.udf((s: String) => TextKernels.flattenJson(if (s == null) "" else s))
    c => u(c)
  }

  /** Greedy word-budget chunker (reference Split). */
  def split_chunks(text: Column, prefix: Column, ctxNum: Column): Column = {
    val u = F.udf((t: String, p: String, n: Int) =>
      TextKernels.split(p, if (t == null) "" else t, n))
    u(text, prefix, ctxNum)
  }

  // ---- text analysis (UDFs over portable primitives) ----

  val lang_id: Column => Column = {
    val u = F.udf((s: String) => TextKernels.langId(if (s == null) "" else s)); c => u(c)
  }
  val quality_score: Column => Column = {
    val u = F.udf((s: String) => TextKernels.qualityScore(if (s == null) "" else s)); c => u(c)
  }
  def shingles(text: Column, n: Int): Column = {
    val u = F.udf((s: String, nn: Int) => TextKernels.shingles(if (s == null) "" else s, nn))
    u(text, F.lit(n))
  }
  def minhash(text: Column, n: Int, k: Int): Column = {
    val u = F.udf((s: String, nn: Int, kk: Int) =>
      TextKernels.minhash(if (s == null) "" else s, nn, kk))
    u(text, F.lit(n), F.lit(k))
  }
  def lsh_bands(sig: Column, bands: Int): Column = {
    val u = F.udf((s: Seq[String], b: Int) =>
      TextKernels.lshBands(if (s == null) Array.empty[String] else s.toArray, b))
    u(sig, F.lit(bands))
  }
  def minhash_fast(text: Column, n: Int, k: Int): Column = {
    val u = F.udf((s: String, nn: Int, kk: Int) =>
      TextKernels.minhashFast(if (s == null) "" else s, nn, kk))
    u(text, F.lit(n), F.lit(k))
  }
  def lsh_bands_long(sig: Column, bands: Int): Column = {
    val u = F.udf((s: Seq[Long], b: Int) =>
      TextKernels.lshBandsLong(if (s == null) Array.empty[Long] else s.toArray, b))
    u(sig, F.lit(bands))
  }
  val simhash: Column => Column = {
    val u = F.udf((s: String) => TextKernels.simhash64(if (s == null) "" else s)); c => u(c)
  }
  /** Engine-portable md5-based SimHash (16 hex chars) — see TextKernels. */
  val simhash_md5: Column => Column = {
    val u = F.udf((s: String) => TextKernels.simhashMd5Hex(if (s == null) "" else s)); c => u(c)
  }
  def hamming64(a: Column, b: Column): Column =
    F.bit_count(a.bitwiseXOR(b))
  /** Hamming distance between two hex signature strings (UDF; for the
    * O(pairs) join hot path use [[hex_to_long_halves]] + xor/bit_count so
    * the per-pair work stays integer-only in codegen). */
  def hamming_hex(a: Column, b: Column): Column = {
    val u = F.udf((x: String, y: String) => TextKernels.hammingHex(x, y))
    u(a, b)
  }

  /** Parse a 16-hex signature into two unsigned 32-bit halves as longs —
    * done ONCE per row so pairwise hamming inside joins is just
    * `bit_count(h1^h1') + bit_count(h2^h2')` (codegen'd integer ops;
    * Spark's conv() is far too slow to sit inside an O(n²) join). */
  def hex_to_long_halves(sig: Column): (Column, Column) = {
    val u = F.udf((s: String) => java.lang.Long.parseLong(s.substring(0, 8), 16))
    val v = F.udf((s: String) => java.lang.Long.parseLong(s.substring(8, 16), 16))
    (u(sig), v(sig))
  }
  val rolling_fingerprint: Column => Column = {
    val u = F.udf((s: String) => TextKernels.rollingFingerprint(if (s == null) "" else s)); c => u(c)
  }
  def jaccard_sim(a: Column, b: Column, n: Int): Column = {
    val u = F.udf((x: String, y: String, nn: Int) => TextKernels.jaccard(x, y, nn))
    u(a, b, F.lit(n))
  }

  /** Whitespace token count — expression-composed (codegen'd, and the exact
    * semantics are reproducible in the DuckDB oracle). */
  /** One BPE merge pass over an `array<string>` symbol column — the
    * learned pair rides as expression constants (codegen, no UDF). */
  def bpe_merge(sym: Column, a: String, b: String): Column =
    col(BpeMergePass(expr(sym), a, b))

  /** Viterbi-segment a word column under a learned unigram LM vocabulary
    * (codegen; the vocab ships as a bounded plan constant). */
  def unigram_segment(w: Column, vocab: Seq[(String, Double)]): Column =
    col(UnigramSegment(expr(w), vocab))

  def token_count(text: Column): Column =
    // Go strings.Fields semantics: empty/whitespace-only → 0 (split of ""
    // yields [""], so guard), else trim + split on whitespace runs.
    F.when(F.length(F.trim(text)) === 0, F.lit(0))
      .otherwise(F.size(F.split(F.trim(text), "\\s+")))

  // ---- aggregates ----

  /** Element-wise mean of an `array<float>` column (centroid recenter, A3).
    * Single-pass TypedImperativeAggregate-backed Aggregator: sums in
    * float64, divides once — no posexplode shuffle of dim×rows. */
  class VectorMeanAgg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {
    def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
      val buf = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      while (i < a.length) { buf(i) += a(i); i += 1 }
      (buf, b._2 + 1)
    }
    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        var i = 0
        while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    }
    def finish(b: (Array[Double], Long)): Seq[Float] =
      if (b._2 == 0) Seq.empty else b._1.map(s => (s / b._2).toFloat).toSeq
    def bufferEncoder = ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder = ExpressionEncoder[Seq[Float]]()
  }

  /** vector_mean(array<float>) aggregate Column. */
  def vector_mean(c: Column): Column = {
    val agg = F.udaf(new VectorMeanAgg, ExpressionEncoder[Seq[Float]]())
    agg(c)
  }

  /** Bounded top-k-per-group aggregate over (score, id) pairs, ordered
    * (score DESC, id ASC). The buffer never exceeds k entries, so the
    * partial-aggregation pass ships AT MOST k rows per group per task —
    * the scale-correct alternative to `row_number().over(window)` top-k,
    * which shuffles and sorts EVERY row of every group. Generic in the
    * id type (one insertion/merge implementation for the long and
    * string instantiations — a fix to the buffer logic cannot diverge
    * between them); ids tie-break ASC under `ord` for determinism. */
  sealed class TopKAggBase[I](k: Int)(implicit ord: Ordering[I],
      benc: org.apache.spark.sql.Encoder[Seq[(Double, I)]])
      extends Aggregator[(Double, I), Seq[(Double, I)], Seq[(Double, I)]] {
    private def order(a: (Double, I), b: (Double, I)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && ord.lt(a._2, b._2))
    private def insert(buf: Seq[(Double, I)], x: (Double, I)): Seq[(Double, I)] = {
      if (buf.length == k && !order(x, buf.last)) buf
      else ((buf :+ x).sortWith(order)).take(k)
    }
    def zero: Seq[(Double, I)] = Vector.empty
    def reduce(b: Seq[(Double, I)], a: (Double, I)): Seq[(Double, I)] = insert(b, a)
    def merge(x: Seq[(Double, I)], y: Seq[(Double, I)]): Seq[(Double, I)] =
      (x ++ y).sortWith(order).take(k)
    def finish(b: Seq[(Double, I)]): Seq[(Double, I)] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, I)]] = benc
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, I)]] = benc
  }

  /** [[TopKAggBase]] over long ids. */
  class TopKAgg(k: Int) extends TopKAggBase[Long](k)(
    Ordering.Long, ExpressionEncoder[Seq[(Double, Long)]]())

  /** [[TopKAggBase]] over STRING ids (URL/hash-keyed corpora) — the id
    * tie-break is lexicographic, deterministic like the long form. */
  class TopKAggStr(k: Int) extends TopKAggBase[String](k)(
    Ordering.String, ExpressionEncoder[Seq[(Double, String)]]())

  /** top_k_by(score, id, k) → array<struct<_1: score, _2: id>> sorted
    * (score DESC, id ASC), at most k entries. */
  def top_k_by(score: Column, id: Column, k: Int): Column = {
    val agg = F.udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    agg(score, id)
  }

  /** [[top_k_by]] with a string id column. */
  def top_k_by_str(score: Column, id: Column, k: Int): Column = {
    val agg = F.udaf(new TopKAggStr(k), ExpressionEncoder[(Double, String)]())
    agg(score, id)
  }

  /** Single-partition window key for KNOWN-BOUNDED window inputs (a ≤30
    * row page, a ≤shuffle-partitions offsets table, a dimension-sized
    * name set). Evaluates to 0 for every row — the same one-partition
    * plan an empty partition spec produces — but keeps the spec
    * NON-empty so WindowExec's unpartitioned-window warning (and
    * PlanRegressionSpec's empty-spec ban) stays a real signal for
    * corpus-sized windows. Built on `hash(anchor) % 1` rather than a
    * literal because Spark 4's EliminateWindowPartitions optimizer rule
    * strips foldable partition keys; `anchor` is any column of the
    * input. */
  def one_partition(anchor: Column): Column =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(anchor),
      org.apache.spark.sql.functions.lit(1))

  /** Register the native expressions for SQL use (`SELECT cosine_sim(a,b)`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim_q", es => CosineSimQ(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_vec", es => QuantizeVec(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dequantize_vec", es => DequantizeVec(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("noop_embed", es => NoopEmbed(es.head, 512), "scala_udf")
    reg.createOrReplaceTempFunction("bpe_merge_pass", {
      case Seq(sym,
          org.apache.spark.sql.catalyst.expressions.Literal(a, _: org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.catalyst.expressions.Literal(b, _: org.apache.spark.sql.types.StringType)) =>
        BpeMergePass(sym, a.toString, b.toString)
      case _ => throw new IllegalArgumentException(
        "bpe_merge_pass(sym, 'a', 'b') — the pair must be string literals")
    }, "scala_udf")
  }
}
