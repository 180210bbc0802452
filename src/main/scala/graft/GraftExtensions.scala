package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Session-extensions entry point: registers the engine's native
  * expressions as session builtins, so a cluster deploy needs only
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no driver code).
  * `gf.registerAll` remains for programmatic use on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.FuseVectorOps)
    // plans the curation TVFs' execution-deferred leaves — see
    // graft.plans.LazyTvfPlan
    ext.injectPlannerStrategy(_ => graft.plans.LazyTvfStrategy)
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_sim_q"),
      info("cosine_sim_q", "cosine_sim_q(a, b) - fused dequantize+cosine over packed vectors"),
      (es: Seq[Expression]) => CosineSimQ(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("quantize_vec"),
      info("quantize_vec", "quantize_vec(a) - pack float array to min/max+uint8 codes"),
      (es: Seq[Expression]) => QuantizeVec(es.head)))
    ext.injectFunction((FunctionIdentifier("dequantize_vec"),
      info("dequantize_vec", "dequantize_vec(b) - unpack quantized binary to float array"),
      (es: Seq[Expression]) => DequantizeVec(es.head)))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(a) - L2-normalize a float array"),
      (es: Seq[Expression]) => L2Normalize(es.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonical composition"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("noop_embed"),
      info("noop_embed", "noop_embed(text[, dim]) - deterministic fake embedding"),
      (es: Seq[Expression]) => es match {
        case Seq(t) => NoopEmbed(t, 512)
        case Seq(t, Literal(d: Int, _)) => NoopEmbed(t, d)
        case _ => throw new IllegalArgumentException("noop_embed(text[, dim])")
      }))
    ext.injectFunction((FunctionIdentifier("bpe_merge_pass"),
      info("bpe_merge_pass",
        "bpe_merge_pass(sym, 'a', 'b') - one greedy BPE merge pass over a symbol array"),
      (es: Seq[Expression]) => es match {
        case Seq(sym, Literal(a, _: org.apache.spark.sql.types.StringType),
            Literal(b, _: org.apache.spark.sql.types.StringType)) =>
          BpeMergePass(sym, a.toString, b.toString)
        case _ => throw new IllegalArgumentException(
          "bpe_merge_pass(sym, 'a', 'b') — the pair must be string literals")
      }))
    // SQL front door for the ANN path: a table-valued function over the
    // quantized on-disk index, so the IVF search is reachable without
    // any Scala (SURVEY §4.3's revisit condition — the REST tier plus
    // this make the engine fully driveable from outside the JVM API)
    ext.injectTableFunction((FunctionIdentifier("vector_search"),
      info("vector_search",
        "vector_search(index_path, model_path, query, k[, nprobe]) - " +
          "pruned IVF top-k over a quantized on-disk index (parquet or " +
          "the binary connector layout, auto-detected); query is " +
          "text (noop-embedded) or a float/double array vector"),
      (es: Seq[Expression]) => GraftExtensions.vectorSearchPlan(es)))
    // SQL front door for the CURATION pipeline (the vector_search
    // precedent): the fused dedup keep/drop verdict and the
    // benchmark-containment audit as table-valued functions, so the
    // REST/SQL tier can drive the flagship verdict without any Scala
    ext.injectTableFunction((FunctionIdentifier("curation_verdict"),
      info("curation_verdict",
        "curation_verdict(dir[, banded]) - the fused dedup keep/drop " +
          "verdict (q124 shape: exact-fingerprint canon, best cluster " +
          "representative, not subsumed) over the documents table at " +
          "dir; banded=true routes pair generation through the LSH " +
          "star source (the crawl-scale path — linear even in a " +
          "near-identical mega-cluster). The corpus-scale pipeline " +
          "builds and runs at FIRST EXECUTION of the query (EXPLAIN " +
          "is free); each invocation runs it afresh - run once and " +
          "cache/write the result (SQL-only: CACHE TABLE v AS SELECT * " +
          "FROM curation_verdict(...)) rather than re-invoking per request"),
      (es: Seq[Expression]) => GraftExtensions.curationVerdictPlan(es)))
    ext.injectTableFunction((FunctionIdentifier("bench_contain"),
      info("bench_contain",
        "bench_contain(dir, bench_dir) - benchmark-containment " +
          "decontamination pairs (q130 rule): corpus = documents at " +
          "dir, suite = documents at bench_dir; emits (bench_doc, " +
          "corpus_doc, n_shared, containment, contaminated). Runs at " +
          "first execution, not analysis - EXPLAIN is free; CACHE " +
          "TABLE ... AS SELECT runs it exactly once"),
      (es: Seq[Expression]) => GraftExtensions.benchContainPlan(es)))
    ext.injectTableFunction((FunctionIdentifier("decontaminate_rewrite"),
      info("decontaminate_rewrite",
        "decontaminate_rewrite(dir, bench_dir) - q131's span surgery: " +
          "cut the 8-token chunks of each corpus document (documents " +
          "table at dir) that appear in the eval suite (documents at " +
          "bench_dir); emits (doc_id, n_chunks, n_removed, text_kept). " +
          "Runs at first execution, not analysis - EXPLAIN is free; " +
          "CACHE TABLE ... AS SELECT runs it exactly once"),
      (es: Seq[Expression]) => GraftExtensions.decontaminateRewritePlan(es)))
    ext.injectTableFunction((FunctionIdentifier("pack_sequences"),
      info("pack_sequences",
        "pack_sequences(dir, seq_len) - GPT-style sequence packing " +
          "(q132): per language, the documents table at dir " +
          "concatenated in doc_id order and chopped into consecutive " +
          "seq_len-token sequences, docs split across boundaries; " +
          "emits (lang, seq_id, n_docs, n_tokens, text_packed, " +
          "spans). Runs at first execution, not analysis - EXPLAIN " +
          "is free; CACHE TABLE ... AS SELECT runs it exactly once"),
      (es: Seq[Expression]) => GraftExtensions.packSequencesPlan(es)))
    ext.injectTableFunction((FunctionIdentifier("drift_windows"),
      info("drift_windows",
        "drift_windows(dir[, bucket_w]) - q136's windowed drift " +
          "monitor: per (source, arrival bucket of bucket_w doc_ids, " +
          "default 50) mean quality and the drift from the source's " +
          "cumulative mean through that bucket; emits (source, " +
          "bucket, n_docs, mean_q, drift). Every row is final when " +
          "its bucket completes - the alerting form of the q114 " +
          "dashboard. Runs at first execution, not analysis - " +
          "EXPLAIN is free; CACHE TABLE ... AS SELECT runs it " +
          "exactly once"),
      (es: Seq[Expression]) => GraftExtensions.driftWindowsPlan(es)))
    ext.injectTableFunction((FunctionIdentifier("drift_windows_ts"),
      info("drift_windows_ts",
        "drift_windows_ts(dir[, window_minutes]) - q137's EVENT-TIME " +
          "drift monitor: per (event_type, tumbling window_minutes " +
          "window of events.ts, default 360) mean value (hundredth " +
          "units) and the drift from the type's cumulative mean " +
          "through that window; emits (source, bucket, n_docs, " +
          "mean_q, drift). The SQL door to the streaming monitor's " +
          "event-time semantics - streamingDriftMonitor replays a " +
          "live stream of this shape window-for-window. Runs at " +
          "first execution, not analysis - EXPLAIN is free; CACHE " +
          "TABLE ... AS SELECT runs it exactly once"),
      (es: Seq[Expression]) => GraftExtensions.driftWindowsTsPlan(es)))
    // engine marker: lets a deploy assert the extensions actually loaded
    ext.injectFunction((FunctionIdentifier("graft_engine_version"),
      info("graft_engine_version", "graft_engine_version() - engine version string"),
      (_: Seq[Expression]) => Literal.create("graft-0.2", org.apache.spark.sql.types.StringType)))
  }
}

object GraftExtensions {

  /** Literal-argument evaluation shared by the TVF builders. */
  private def evalLitArg(es: Seq[Expression], i: Int, tvf: String): Any = {
    require(es(i).foldable, s"$tvf argument ${i + 1} must be a literal")
    val v = es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(v != null, s"$tvf argument ${i + 1} must not be NULL")
    v
  }

  /** Integral-literal evaluation shared by the TVF builders: the same
    * require-style usage errors for a string/NULL where a count
    * belongs (a raw asInstanceOf surfaced those as CCE/NPE). */
  private def evalIntArg(es: Seq[Expression], i: Int, tvf: String,
      what: String): Long = {
    val v = evalLitArg(es, i, tvf)
    require(v.isInstanceOf[java.lang.Integer] ||
      v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Short] ||
      v.isInstanceOf[java.lang.Byte],
      s"$tvf: $what must be an INTEGRAL literal, got ${es(i).sql}")
    v.asInstanceOf[Number].longValue()
  }

  /** Fresh output attributes for a TVF's declared schema, nullability
    * included: non-null is declared exactly where the wrapped pipeline
    * guarantees it (a coalesce/count-backed column), so SQL consumers
    * composing on top keep null-filter pruning;
    * [[graft.plans.LazyTvfExec]] fail-fasts at execution if the built
    * pipeline's names/types drift or a declared non-null column comes
    * back nullable. */
  private def tvfOutput(fields: (String,
      org.apache.spark.sql.types.DataType, Boolean)*)
      : Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    fields.map { case (n, t, nullable) =>
      org.apache.spark.sql.catalyst.expressions
        .AttributeReference(n, t, nullable)()
    }

  /** The (doc_id, …) projection of the documents table at a dataset
    * dir — the load every curation TVF thunk starts from
    * ([[graft.Tables.loadP]] for the single-row-group parallelism
    * floor these kernel-heavy pipelines need). */
  private def docsAt(spark: org.apache.spark.sql.SparkSession,
      dir: String, cols: String*): org.apache.spark.sql.DataFrame =
    graft.Tables.loadP(spark, dir, "documents")
      .select(cols.map(org.apache.spark.sql.functions.col): _*)

  /** Build the `curation_verdict` TVF plan — an execution-deferred
    * leaf ([[graft.plans.LazyTvfPlan]]) wrapping exactly the library's
    * [[graft.DedupQueries.q124DedupVerdict]] /
    * [[graft.DedupQueries.q134DedupVerdictStar]] pipeline
    * (ExtensionsSpec pins the inner-plan equivalence). Analysis only validates the literal
    * arguments and declares the schema; the corpus-scale pipeline —
    * including its size-gate pins — builds and runs at the query's
    * FIRST EXECUTION, so EXPLAIN at every tier is free and an
    * invocation that is never executed pins nothing (the r11 builders
    * ran all of it at analysis time — a dashboard EXPLAIN cost minutes
    * at 10M docs). Each executed invocation still runs the pipeline
    * afresh; a serving tier should run it once and cache/write the
    * verdict table, not re-invoke the TVF per request. */
  private[graft] def curationVerdictPlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    require(es.length == 1 || es.length == 2,
      "curation_verdict(dir[, banded])")
    val dir = evalLitArg(es, 0, "curation_verdict").toString
    val banded = es.length == 2 && {
      val v = evalLitArg(es, 1, "curation_verdict")
      // a raw asInstanceOf surfaced non-boolean literals as
      // ClassCastException and NULL as NPE — give SQL users the same
      // require-style usage errors the other argument checks do
      require(v.isInstanceOf[java.lang.Boolean],
        "curation_verdict(dir[, banded]): banded must be a BOOLEAN " +
          s"literal (true/false), got ${es(1).sql}")
      v.asInstanceOf[java.lang.Boolean].booleanValue()
    }
    graft.plans.LazyTvfPlan(s"curation_verdict($dir, banded=$banded)",
      tvfOutput(("doc_id", LongType, true), ("fp_keep", BooleanType, true),
        ("cluster_id", LongType, true), ("rep_keep", BooleanType, false),
        ("subsumed", BooleanType, false), ("keep", BooleanType, true)),
      spark =>
        if (banded) graft.DedupQueries.q134DedupVerdictStar(spark, dir)
        else graft.DedupQueries.q124DedupVerdict(spark, dir))
  }

  /** Build the `bench_contain` TVF plan — an execution-deferred leaf
    * wrapping [[graft.DedupQueries.benchContainment]] between the
    * documents tables at two dataset dirs (corpus, suite). Same
    * deferral contract as `curation_verdict`. */
  private[graft] def benchContainPlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    require(es.length == 2, "bench_contain(dir, bench_dir)")
    val dir = evalLitArg(es, 0, "bench_contain").toString
    val benchDir = evalLitArg(es, 1, "bench_contain").toString
    graft.plans.LazyTvfPlan(s"bench_contain($dir, $benchDir)",
      tvfOutput(("bench_doc", LongType, true), ("corpus_doc", LongType, true),
        ("n_shared", LongType, false), ("containment", DoubleType, true),
        ("contaminated", BooleanType, true)),
      spark => graft.DedupQueries.benchContainment(
        docsAt(spark, dir, "doc_id", "text"),
        docsAt(spark, benchDir, "doc_id", "text")))
  }

  /** Build the `decontaminate_rewrite` TVF plan — an
    * execution-deferred leaf wrapping
    * [[graft.AnalyticsQueries.decontaminateRewrite]] (q131's span
    * surgery) between the documents tables at two dataset dirs.
    * Completes the SQL front door's decontamination symmetry: Drop
    * mode (`bench_contain` + a WHERE) and Rewrite mode both reachable
    * without Scala. Same deferral contract as `curation_verdict` —
    * the suite prep and verdict pins materialize at first execution,
    * never at analysis. */
  private[graft] def decontaminateRewritePlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    require(es.length == 2, "decontaminate_rewrite(dir, bench_dir)")
    val dir = evalLitArg(es, 0, "decontaminate_rewrite").toString
    val benchDir = evalLitArg(es, 1, "decontaminate_rewrite").toString
    graft.plans.LazyTvfPlan(s"decontaminate_rewrite($dir, $benchDir)",
      tvfOutput(("doc_id", LongType, true), ("n_chunks", LongType, true),
        ("n_removed", LongType, false), ("text_kept", StringType, true)),
      spark => graft.AnalyticsQueries.decontaminateRewrite(
        docsAt(spark, dir, "doc_id", "text"),
        docsAt(spark, benchDir, "doc_id", "text")))
  }

  /** Build the `pack_sequences` TVF plan — an execution-deferred leaf
    * wrapping [[graft.CurationQueries.packSequences]] (q132's GPT-style
    * packing, the range-exchange no-corpus-window plan) over the
    * documents table at a dataset dir. The packing's prefix-sum pin
    * materializes at first execution, never at analysis. */
  private[graft] def packSequencesPlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    require(es.length == 2, "pack_sequences(dir, seq_len)")
    val dir = evalLitArg(es, 0, "pack_sequences").toString
    val seqLen = evalIntArg(es, 1, "pack_sequences(dir, seq_len)", "seq_len")
    require(seqLen > 0,
      s"pack_sequences(dir, seq_len): seq_len must be positive, got $seqLen")
    graft.plans.LazyTvfPlan(s"pack_sequences($dir, $seqLen)",
      tvfOutput(("lang", StringType, true), ("seq_id", LongType, false),
        ("n_docs", LongType, false), ("n_tokens", LongType, true),
        ("text_packed", StringType, false), ("spans", StringType, false)),
      spark => graft.CurationQueries.packSequences(
        docsAt(spark, dir, "doc_id", "lang", "text"), seqLen))
  }

  /** Build the `drift_windows` TVF plan — an execution-deferred leaf
    * wrapping [[graft.AuditQueries.driftWindowsAt]] (q136's pipeline)
    * over the documents table at a dataset dir, with the arrival
    * bucket width as the SQL caller's knob (default 50 = the registry
    * instance the oracle pins). Same deferral contract as the other
    * curation TVFs; this pipeline pins nothing, so deferral here buys
    * only the uniform EXPLAIN-is-free story. */
  private[graft] def driftWindowsPlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    require(es.length == 1 || es.length == 2,
      "drift_windows(dir[, bucket_w])")
    val dir = evalLitArg(es, 0, "drift_windows").toString
    val bucketW = if (es.length == 2)
      evalIntArg(es, 1, "drift_windows(dir, bucket_w)", "bucket_w")
    else 50L
    require(bucketW > 0,
      s"drift_windows(dir, bucket_w): bucket_w must be positive, got $bucketW")
    graft.plans.LazyTvfPlan(s"drift_windows($dir, $bucketW)",
      tvfOutput(("source", StringType, true), ("bucket", LongType, true),
        ("n_docs", LongType, false), ("mean_q", DoubleType, true),
        ("drift", DoubleType, true)),
      spark => graft.AuditQueries.driftWindowsAt(spark, dir, bucketW))
  }

  /** Build the `drift_windows_ts` TVF plan — an execution-deferred
    * leaf wrapping [[graft.AuditQueries.driftWindowsTsAt]] (q137's
    * event-time pipeline) over the events table at a dataset dir, with
    * the tumbling-window width in minutes as the SQL caller's knob
    * (default 360 = the registry instance the oracle pins). Same
    * deferral contract as `drift_windows`. */
  private[graft] def driftWindowsTsPlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    require(es.length == 1 || es.length == 2,
      "drift_windows_ts(dir[, window_minutes])")
    val dir = evalLitArg(es, 0, "drift_windows_ts").toString
    val winMin = if (es.length == 2)
      evalIntArg(es, 1, "drift_windows_ts(dir, window_minutes)",
        "window_minutes")
    else 360L
    require(winMin > 0,
      "drift_windows_ts(dir, window_minutes): window_minutes must be " +
        s"positive, got $winMin")
    graft.plans.LazyTvfPlan(s"drift_windows_ts($dir, $winMin)",
      tvfOutput(("source", StringType, true), ("bucket", LongType, true),
        ("n_docs", LongType, false), ("mean_q", DoubleType, true),
        ("drift", DoubleType, true)),
      spark => graft.AuditQueries.driftWindowsTsAt(spark, dir, winMin))
  }

  /** Build the `vector_search` logical plan: resolve the literal
    * arguments at analysis time, load the (tiny) centroid model, and
    * return the pruned search plan for WHICHEVER index layout sits at
    * `index_path` — the binary connector's (detected by its `_dim`
    * root meta file → [[graft.sources.IvfBinarySource.search]], a DSv2
    * scan planning only the probed lists) or the quantized parquet
    * layout ([[graft.index.IvfIndex.searchQuantized]], partition
    * pruning on centroid_id). Both end in the fused quantized-cosine
    * kernel and a TakeOrderedAndProject top-k, so SQL callers get the
    * same plan the Scala APIs produce. The model load is one
    * driver-side read of a k×dim parquet; the `_dim` sniff is one
    * existence check against the FS the planner is about to list
    * anyway; the search itself stays fully distributed and pruned. */
  private[graft] def vectorSearchPlan(es: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.types._
    val usage = "vector_search(index_path, model_path, query, k[, nprobe])"
    require(es.length == 4 || es.length == 5, usage)
    val spark = org.apache.spark.sql.SparkSession.active
    val indexPath = evalLitArg(es, 0, usage).toString
    val modelPath = evalLitArg(es, 1, usage).toString
    val model = graft.index.IvfIndex.loadModel(spark, modelPath)
    val dim = model.centroids.headOption.map(_.length).getOrElse(0)
    val qvec: Array[Float] = (evalLitArg(es, 2, usage), es(2).dataType) match {
      case (s: org.apache.spark.unsafe.types.UTF8String, _) =>
        // text query: the deterministic noop embed twin, reference
        // query prefix (a live deployment embeds OUTSIDE SQL and passes
        // the vector as an array literal)
        VectorKernels.dequantize(
          VectorKernels.noopEmbed("search_query: " + s.toString, dim))
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
          ArrayType(FloatType, _)) => a.toFloatArray()
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
          ArrayType(DoubleType, _)) => a.toDoubleArray().map(_.toFloat)
      case (_, t) => throw new IllegalArgumentException(
        s"vector_search query must be text or array<float|double>, got $t")
    }
    // bounds-check on the LONG before narrowing — a BIGINT literal
    // like 2^32+1 would .toInt-wrap to a small positive k and silently
    // truncate the result set instead of erroring
    def positiveInt(i: Int, what: String): Int = {
      val v = evalIntArg(es, i, usage, what)
      require(v > 0 && v <= Int.MaxValue,
        s"$usage: $what must be a positive INT, got $v")
      v.toInt
    }
    val k = positiveInt(3, "k")
    val nprobe = if (es.length == 5) positiveInt(4, "nprobe") else 1
    val dimMeta = new org.apache.hadoop.fs.Path(indexPath, "_dim")
    val isBinary = dimMeta
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dimMeta)
    val search =
      if (isBinary)
        graft.sources.IvfBinarySource.search(spark, indexPath, model,
          qvec, k, nprobe)
      else graft.index.IvfIndex.searchQuantized(
        spark.read.parquet(indexPath), model, "vec_id", "qvec",
        qvec, k, nprobe)
    search.queryExecution.logical
  }
}
