package graft

import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions entry point: the engine's functions are session
  * builtins with no driver-side registration call. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark // built with GraftExtensions

  test("extensions register builtins (no registerAll needed)") {
    // marker function exists only via the extensions path
    assert(spark.sql("SELECT graft_engine_version() AS v").head().getString(0)
      == "graft-0.2")
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS one,
        |       size(dequantize_vec(quantize_vec(array(1.0f, -2.0f, 3.0f)))) AS n,
        |       size(dequantize_vec(noop_embed('hello'))) AS d512
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 512)
    // NFC: decomposed e+U+0301 composes to one codepoint (the combining
    // mark is embedded directly — Spark's chr() is ASCII-only)
    val nfc = spark.sql(
      "SELECT length(nfc_normalize('café')) AS n").head()
    assert(nfc.getInt(0) == 4)
  }

  test("bpe_merge_pass is SQL-callable with literal pairs, and only those") {
    val out = spark.sql(
      "SELECT bpe_merge_pass(array('a', 'a', 'a'), 'a', 'a') AS m")
      .head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
    val e = intercept[Exception](
      spark.sql("SELECT bpe_merge_pass(array('a'), 'a', lower('B'))").head())
    assert(e.getMessage.contains("string literals") ||
      e.getCause != null && e.getCause.getMessage.contains("string literals"))
  }

  test("vector_search runs the IVF path from pure SQL with a pruned index scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // build a small quantized on-disk index + persisted model
    val dir = java.nio.file.Files.createTempDirectory("sqlsearch").toString
    val (idxDir, modelDir) = (s"$dir/index", s"$dir/model")
    val emb = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val (assigned, model) = graft.index.IvfIndex.build(
      emb, "embedding", graft.index.IvfIndex.Params(listSize = 64))
    graft.index.IvfIndex.writeQuantized(assigned, "embedding", idxDir)
    graft.index.IvfIndex.saveModel(spark, model, modelDir)

    // TEXT query through spark.sql ONLY — no Scala search API
    val df = spark.sql(
      s"SELECT * FROM vector_search('$idxDir', '$modelDir', 'needle in a haystack', 5, 2)")
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.length == 5)
    // equals the Scala-API search over the same index/model
    val expect = graft.index.IvfIndex.searchQuantized(
      spark.read.parquet(idxDir), model, "vec_id", "qvec",
      graft.functions.VectorKernels.dequantize(
        graft.functions.VectorKernels.noopEmbed(
          "search_query: needle in a haystack", 64)),
      k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect, s"sql=$got scala=$expect")
    // the physical plan scans ONLY the probed lists: partition pruning
    // on centroid_id reaches the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"index scan not partition-pruned:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not streaming-partial:\n$plan")

    // ARRAY-vector query (the production shape: embed outside SQL)
    val qv = graft.functions.VectorKernels.dequantize(
      graft.functions.VectorKernels.noopEmbed(
        "search_query: needle in a haystack", 64))
    val arrSql = qv.map(v => s"CAST($v AS FLOAT)").mkString("array(", ", ", ")")
    val got2 = spark.sql(
      s"SELECT * FROM vector_search('$idxDir', '$modelDir', $arrSql, 5, 2)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == expect, s"array-query sql=$got2")
    // and it composes as a plain relation
    val joined = spark.sql(
      s"""SELECT count(*) AS n FROM vector_search('$idxDir', '$modelDir', 'x', 10, 1) v
         |JOIN parquet.`${SparkSuite.sf0001}/embeddings.parquet` e ON v.vec_id = e.vec_id
         |""".stripMargin).head().getLong(0)
    assert(joined == 10L)
  }

  test("function descriptions are visible to DESCRIBE FUNCTION") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("cosine_sim"), desc)
  }

  test("vector_search resolves a binary-connector index with list pruning") {
    import org.apache.spark.sql.functions._
    // same build as the parquet test, but the index lands in the DSv2
    // binary layout — the TVF must auto-detect it (root _dim meta) and
    // plan the connector scan over ONLY the probed lists
    val dir = java.nio.file.Files.createTempDirectory("sqlbinsearch").toString
    val (idxDir, modelDir) = (s"$dir/index", s"$dir/model")
    val emb = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val (assigned, model) = graft.index.IvfIndex.build(
      emb, "embedding", graft.index.IvfIndex.Params(listSize = 64))
    graft.sources.IvfBinarySource.write(assigned, "vec_id", "embedding", idxDir)
    graft.index.IvfIndex.saveModel(spark, model, modelDir)

    val df = spark.sql(
      s"SELECT * FROM vector_search('$idxDir', '$modelDir', 'needle in a haystack', 5, 2)")
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.length == 5)
    // equals the connector's Scala search API over the same index/model
    val qv = graft.functions.VectorKernels.dequantize(
      graft.functions.VectorKernels.noopEmbed(
        "search_query: needle in a haystack", 64))
    val expect = graft.sources.IvfBinarySource
      .search(spark, idxDir, model, qv, 5, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect, s"sql=$got scala=$expect")
    // the connector scan plans exactly the probed lists
    val probed = model.probe(qv, 2).sorted
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"lists=[${probed.mkString(",")}]"),
      s"binary scan not list-pruned to $probed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not streaming-partial:\n$plan")
  }

  /** Physical-operator histogram: the TVF "plan equals the library
    * plan" pin, robust to expression-id and checkpoint-RDD-id noise
    * that makes plan-string equality meaningless for pinned queries. */
  private def opHistogram(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.queryExecution.sparkPlan
      .collect { case p => p.getClass.getSimpleName }
      .groupBy(identity).map { case (k, v) => k -> v.size }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** The curation TVFs are execution-deferred leaves
    * ([[graft.plans.LazyTvfExec]]) — the TVF≡library plan pin reads
    * the INNER pipeline the exec node builds (building it here is
    * fine: specs run at execution tier, the deferral contract only
    * protects analysis/EXPLAIN). */
  private def innerOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val execs = df.queryExecution.sparkPlan.collect {
      case e: graft.plans.LazyTvfExec => e
    }
    assert(execs.nonEmpty, s"no LazyTvfExec in:\n${df.queryExecution.sparkPlan}")
    execs.head.inner
  }

  test("curation_verdict TVF runs the flagship verdict from pure SQL") {
    val dir = SparkSuite.sf0001
    val sql = spark.sql(s"SELECT * FROM curation_verdict('$dir')")
    val lib = DedupQueries.q124DedupVerdict(spark, dir)
    assert(rowsOf(sql) == rowsOf(lib), "TVF verdict != library verdict")
    assert(opHistogram(innerOf(sql)) == opHistogram(lib),
      s"TVF inner plan diverged from the library plan:\n" +
        s"${opHistogram(innerOf(sql))}\nvs\n${opHistogram(lib)}")
    // the declared TVF schema is a constant — pin it to the library's,
    // NULLABILITY INCLUDED (rep_keep/subsumed are coalesce-backed
    // non-null; declaring them so preserves null-filter pruning for
    // SQL consumers)
    assert(sql.schema.map(f => (f.name, f.dataType, f.nullable)) ==
      lib.schema.map(f => (f.name, f.dataType, f.nullable)),
      "declared curation_verdict schema drifted from the library")
    // the banded route is selectable from SQL too (and is the STAR
    // form — the crawl-scale default), and keep is sane
    val banded = spark.sql(
      s"SELECT count(*) AS n FROM curation_verdict('$dir', true) WHERE keep")
      .head().getLong(0)
    val bandedLib = DedupQueries.q134DedupVerdictStar(spark, dir)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(banded == bandedLib)
    // composes as a relation: the quarantine split is one WHERE clause
    val dropped = spark.sql(
      s"SELECT count(*) AS n FROM curation_verdict('$dir') WHERE NOT keep")
      .head().getLong(0)
    assert(dropped == rowsOf(lib).size - spark.sql(
      s"SELECT count(*) AS n FROM curation_verdict('$dir') WHERE keep")
      .head().getLong(0))
  }

  test("bench_contain TVF equals benchContainment over the same tables") {
    import org.apache.spark.sql.functions._
    // corpus = sf0.001 documents; suite = a 3-doc slice written out as
    // its own documents table (the two-dir shape a release audit runs)
    val bdir = java.nio.file.Files.createTempDirectory("benchdir").toString
    Tables.load(spark, SparkSuite.sf0001, "documents")
      .filter(col("doc_id") < 3).select("doc_id", "text")
      .write.parquet(s"$bdir/documents.parquet")
    val sql = spark.sql(
      s"SELECT * FROM bench_contain('${SparkSuite.sf0001}', '$bdir')")
    val lib = DedupQueries.benchContainment(
      Tables.loadP(spark, SparkSuite.sf0001, "documents")
        .select("doc_id", "text"),
      Tables.loadP(spark, bdir, "documents").select("doc_id", "text"))
    assert(rowsOf(sql) == rowsOf(lib))
    assert(opHistogram(innerOf(sql)) == opHistogram(lib))
    assert(sql.schema.map(f => (f.name, f.dataType, f.nullable)) ==
      lib.schema.map(f => (f.name, f.dataType, f.nullable)),
      "declared bench_contain schema drifted from the library")
    // the corpus docs contain their own text (C = 1.0 self-pairs)
    assert(sql.filter(col("bench_doc") === col("corpus_doc") &&
      col("contaminated")).count() == 3)
  }

  test("decontaminate_rewrite TVF equals the library rewrite over the same tables") {
    import org.apache.spark.sql.functions._
    val bdir = java.nio.file.Files.createTempDirectory("rwbenchdir").toString
    Tables.load(spark, SparkSuite.sf0001, "documents")
      .filter(col("doc_id") < 3).select("doc_id", "text")
      .write.parquet(s"$bdir/documents.parquet")
    val sql = spark.sql(
      s"SELECT * FROM decontaminate_rewrite('${SparkSuite.sf0001}', '$bdir')")
    val lib = AnalyticsQueries.decontaminateRewrite(
      Tables.loadP(spark, SparkSuite.sf0001, "documents")
        .select("doc_id", "text"),
      Tables.loadP(spark, bdir, "documents").select("doc_id", "text"))
    assert(rowsOf(sql) == rowsOf(lib))
    assert(opHistogram(innerOf(sql)) == opHistogram(lib))
    assert(sql.schema.map(f => (f.name, f.dataType, f.nullable)) ==
      lib.schema.map(f => (f.name, f.dataType, f.nullable)),
      "declared decontaminate_rewrite schema drifted from the library")
    // the suite docs are self-leaked: every FULL 8-token chunk removed
    // (the ragged final chunk is < 8 tokens, so it has no 8-token
    // suite shingle to match — only an exact-multiple doc loses all)
    assert(sql.filter(col("doc_id") < 3 && col("n_removed") > 0 &&
      col("n_removed") >= col("n_chunks") - 1).count() == 3)
    // and it composes as a relation: the quarantine/keep split is SQL
    assert(spark.sql(
      s"""SELECT count(*) FROM decontaminate_rewrite(
         |  '${SparkSuite.sf0001}', '$bdir') WHERE n_removed = 0
         |""".stripMargin).head().getLong(0) > 0)
  }

  test("a curation TVF composes in a self-join (MultiInstanceRelation)") {
    import org.apache.spark.sql.functions._
    // two invocations of the same TVF in one query: the analyzer must
    // mint fresh attribute ids per instance (newInstance) or the join
    // is rejected/mis-resolved
    val dir = SparkSuite.sf0001
    val n = spark.sql(
      s"""SELECT count(*) AS n
         |FROM curation_verdict('$dir') a
         |JOIN curation_verdict('$dir') b ON a.doc_id = b.doc_id
         |WHERE a.keep AND b.keep
         |""".stripMargin).head().getLong(0)
    val lib = DedupQueries.q124DedupVerdict(spark, dir)
      .filter(col("keep")).count()
    assert(n == lib, s"self-join count $n != library keep count $lib")
  }

  test("curation TVF EXPLAIN runs ZERO jobs and pins nothing (execution-deferred)") {
    val dir = SparkSuite.sf0001
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // flush in-flight events from earlier tests, then snapshot pins
    org.apache.spark.graftsync.ListenerSync.waitUntilEmpty(sc)
    sc.addSparkListener(listener)
    val pinsBefore = sc.getPersistentRDDs.keySet
    try {
      // every EXPLAIN tier: analysis, optimization, physical planning
      spark.sql(s"EXPLAIN EXTENDED SELECT * FROM curation_verdict('$dir')")
        .collect()
      spark.sql(s"EXPLAIN SELECT * FROM curation_verdict('$dir', true)")
        .collect()
      spark.sql(s"EXPLAIN SELECT * FROM bench_contain('$dir', '$dir')")
        .collect()
      spark.sql(
        s"EXPLAIN FORMATTED SELECT * FROM decontaminate_rewrite('$dir', '$dir')")
        .collect()
      spark.sql(s"EXPLAIN SELECT * FROM pack_sequences('$dir', 512)")
        .collect()
      org.apache.spark.graftsync.ListenerSync.waitUntilEmpty(sc)
      assert(jobs.get() == 0,
        s"EXPLAIN over the curation TVFs triggered ${jobs.get()} Spark " +
          "jobs - the pipeline must build at execution, not analysis")
      val newPins = sc.getPersistentRDDs.keySet -- pinsBefore
      assert(newPins.isEmpty,
        s"EXPLAIN left pinned blocks behind: $newPins")
    } finally sc.removeSparkListener(listener)
  }

  test("curation TVF argument errors are require-style, not ClassCastException") {
    val dir = SparkSuite.sf0001
    // the whole cause chain: Spark may wrap builder exceptions
    def msgs(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    // non-boolean banded literal
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM curation_verdict('$dir', 1)").collect())
    assert(msgs(e1).contains("BOOLEAN"),
      s"wrong error for integer banded: ${msgs(e1)}")
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM curation_verdict('$dir', 'true')").collect())
    assert(msgs(e2).contains("BOOLEAN"),
      s"wrong error for string banded: ${msgs(e2)}")
    // NULL literals get the must-not-be-NULL require, not an NPE
    val e3 = intercept[Exception](
      spark.sql(s"SELECT * FROM curation_verdict('$dir', NULL)").collect())
    assert(msgs(e3).contains("NULL"),
      s"wrong error for NULL banded: ${msgs(e3)}")
    val e4 = intercept[Exception](
      spark.sql("SELECT * FROM bench_contain(NULL, 'x')").collect())
    assert(msgs(e4).contains("NULL"),
      s"wrong error for NULL dir: ${msgs(e4)}")
    val e5 = intercept[Exception](
      spark.sql(s"SELECT * FROM pack_sequences('$dir', 'big')").collect())
    assert(msgs(e5).contains("INTEGRAL"),
      s"wrong error for string seq_len: ${msgs(e5)}")
    val e6 = intercept[Exception](
      spark.sql(s"SELECT * FROM pack_sequences('$dir', 0)").collect())
    assert(msgs(e6).contains("positive"),
      s"wrong error for zero seq_len: ${msgs(e6)}")
  }

  test("vector_search argument errors are require-style, not CCE/NPE") {
    import org.apache.spark.sql.functions._
    def msgs(e: Throwable): String = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    // a real index/model so only the BAD argument can fail
    val dir = java.nio.file.Files.createTempDirectory("vsargs").toString
    val (idxDir, modelDir) = (s"$dir/index", s"$dir/model")
    val emb = Tables.load(spark, SparkSuite.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val (assigned, model) = graft.index.IvfIndex.build(
      emb, "embedding", graft.index.IvfIndex.Params(listSize = 64))
    graft.index.IvfIndex.writeQuantized(assigned, "embedding", idxDir)
    graft.index.IvfIndex.saveModel(spark, model, modelDir)
    def bad(call: String): String = msgs(intercept[Exception](
      spark.sql(s"SELECT * FROM vector_search($call)").collect()))
    // string k → INTEGRAL require, not ClassCastException
    val e1 = bad(s"'$idxDir', '$modelDir', 'q', 'five'")
    assert(e1.contains("INTEGRAL"), s"wrong error for string k: $e1")
    // NULL nprobe → must-not-be-NULL require, not NPE
    val e2 = bad(s"'$idxDir', '$modelDir', 'q', 5, NULL")
    assert(e2.contains("NULL"), s"wrong error for NULL nprobe: $e2")
    // non-positive k
    val e3 = bad(s"'$idxDir', '$modelDir', 'q', 0")
    assert(e3.contains("positive"), s"wrong error for zero k: $e3")
    // NULL query
    val e4 = bad(s"'$idxDir', '$modelDir', NULL, 5")
    assert(e4.contains("NULL"), s"wrong error for NULL query: $e4")
    // and the happy path still works after all that
    assert(spark.sql(
      s"SELECT * FROM vector_search('$idxDir', '$modelDir', 'q', 3)")
      .count() == 3)
  }

  test("CACHE TABLE runs a deferred TVF exactly once (SQL-only recipe)") {
    // the TVF cost model says "run once, cache/write" — prove the
    // SQL-only form does that: CACHE TABLE ... AS SELECT materializes
    // the pipeline at cache-build time, and subsequent reads scan the
    // cache without rebuilding (zero pipeline jobs beyond the cached
    // scan's own)
    val dir = SparkSuite.sf0001
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def jobsDuring[T](body: => T): (Int, T) = {
      org.apache.spark.graftsync.ListenerSync.waitUntilEmpty(sc)
      jobs.set(0)
      val r = body
      org.apache.spark.graftsync.ListenerSync.waitUntilEmpty(sc)
      (jobs.get(), r)
    }
    sc.addSparkListener(listener)
    try {
      val (buildJobs, _) = jobsDuring(spark.sql(
        s"CACHE TABLE _cv_once AS SELECT * FROM curation_verdict('$dir')"))
      // the verdict pipeline is many jobs (pins, gates, components)
      assert(buildJobs >= 3, s"cache build ran only $buildJobs jobs")
      val (read1Jobs, n1) = jobsDuring(
        spark.sql("SELECT count(*) AS n FROM _cv_once").head().getLong(0))
      val (read2Jobs, n2) = jobsDuring(
        spark.sql("SELECT count(*) AS n FROM _cv_once WHERE keep")
          .head().getLong(0))
      assert(n1 > 0 && n2 > 0 && n2 <= n1)
      // reads scan the InMemoryRelation. The bound is deliberately
      // LOOSE (an AQE count is 1-2 jobs today; future Spark versions
      // may split differently) — the regression this guards is the
      // r12 canonicalization bug where every cached read re-ran the
      // whole 30+-job verdict pipeline, and that failure mode also
      // exceeds any small constant
      assert(read1Jobs <= 4 && read2Jobs <= 4,
        s"cached reads re-ran the pipeline: $read1Jobs/$read2Jobs jobs")
      // the read is served from the cache scan (the LazyTvfExec string
      // below it is the relation's materialized-plan snapshot, not an
      // execution path — the job counts above prove that). contains,
      // not startsWith: a future Spark may wrap the scan in
      // AdaptiveSparkPlan or rename the node
      val plan = spark.sql("SELECT * FROM _cv_once")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Scan In-memory table") ||
          plan.contains("InMemoryTableScan"),
        s"cached read not served from the cache:\n$plan")
    } finally {
      spark.sql("UNCACHE TABLE IF EXISTS _cv_once")
      spark.sql("DROP TABLE IF EXISTS _cv_once")
      sc.removeSparkListener(listener)
    }
  }

  test("drift_windows TVF equals the library pipeline, knob and default") {
    import org.apache.spark.sql.functions._
    val dir = SparkSuite.sf0001
    // non-default width exercises the SQL knob end to end
    val sql = spark.sql(s"SELECT * FROM drift_windows('$dir', 100)")
    val lib = AuditQueries.driftWindowsAt(spark, dir, 100L)
    assert(rowsOf(sql) == rowsOf(lib))
    assert(opHistogram(innerOf(sql)) == opHistogram(lib))
    assert(sql.schema.map(f => (f.name, f.dataType)) ==
      lib.schema.map(f => (f.name, f.dataType)),
      "declared drift_windows schema drifted from the library")
    // the default width IS the registry instance q136 pins to the oracle
    assert(rowsOf(spark.sql(s"SELECT * FROM drift_windows('$dir')")) ==
      rowsOf(AuditQueries.q136DriftWindows(spark, dir)))
    // the drift definition's anchor invariant holds through the SQL
    // door: a source's FIRST bucket has zero drift (its own mean IS
    // the cumulative mean)
    val firsts = sql.groupBy(col("source").as("_s"))
      .agg(min("bucket").as("_b"))
    val bad = sql.join(firsts,
        col("source") <=> col("_s") && col("bucket") === col("_b"))
      .filter(col("drift") =!= 0.0).count()
    assert(bad == 0, s"$bad first buckets with nonzero drift")
    // argument errors are require-style, like the other TVFs
    val e = intercept[IllegalArgumentException](
      spark.sql(s"SELECT * FROM drift_windows('$dir', 0)").collect())
    assert(e.getMessage.contains("must be positive"), e.getMessage)
  }

  test("drift_windows_ts TVF equals the library pipeline, knob and default") {
    import org.apache.spark.sql.functions._
    val dir = SparkSuite.sf0001
    // non-default width exercises the SQL knob end to end
    val sql = spark.sql(s"SELECT * FROM drift_windows_ts('$dir', 1440)")
    val lib = AuditQueries.driftWindowsTsAt(spark, dir, 1440L)
    assert(rowsOf(sql) == rowsOf(lib))
    assert(opHistogram(innerOf(sql)) == opHistogram(lib))
    assert(sql.schema.map(f => (f.name, f.dataType)) ==
      lib.schema.map(f => (f.name, f.dataType)),
      "declared drift_windows_ts schema drifted from the library")
    // the default width IS the registry instance q137 pins to the oracle
    assert(rowsOf(spark.sql(s"SELECT * FROM drift_windows_ts('$dir')")) ==
      rowsOf(AuditQueries.q137DriftWindowsTs(spark, dir)))
    // the drift definition's anchor invariant holds through the SQL
    // door: a type's FIRST window has zero drift (its own mean IS the
    // cumulative mean)
    val firsts = sql.groupBy(col("source").as("_s"))
      .agg(min("bucket").as("_b"))
    val bad = sql.join(firsts,
        col("source") <=> col("_s") && col("bucket") === col("_b"))
      .filter(col("drift") =!= 0.0).count()
    assert(bad == 0, s"$bad first windows with nonzero drift")
    // argument errors are require-style, like the other TVFs
    val e = intercept[IllegalArgumentException](
      spark.sql(s"SELECT * FROM drift_windows_ts('$dir', 0)").collect())
    assert(e.getMessage.contains("must be positive"), e.getMessage)
  }

  test("pack_sequences TVF equals the library packing over the same table") {
    import org.apache.spark.sql.functions._
    val dir = SparkSuite.sf0001
    val sql = spark.sql(s"SELECT * FROM pack_sequences('$dir', 256)")
    val lib = CurationQueries.packSequences(
      Tables.loadP(spark, dir, "documents").select("doc_id", "lang", "text"),
      256L)
    assert(rowsOf(sql) == rowsOf(lib))
    assert(opHistogram(innerOf(sql)) == opHistogram(lib))
    assert(sql.schema.map(f => (f.name, f.dataType, f.nullable)) ==
      lib.schema.map(f => (f.name, f.dataType, f.nullable)),
      "declared pack_sequences schema drifted from the library")
    // packing invariant holds through the SQL door: every interior
    // sequence is exactly seq_len tokens. NULL-SAFE per-lang max (an
    // `=` correlation would silently exclude a NULL-lang group from
    // the check — packSequences treats NULL lang as an ordinary group)
    val mx = sql.groupBy(col("lang").as("_ml"))
      .agg(max("seq_id").as("_mx"))
    val bad = sql.join(mx, col("lang") <=> col("_ml"))
      .filter(col("seq_id") < col("_mx") && col("n_tokens") =!= 256)
      .count()
    assert(bad == 0, s"$bad interior sequences not exactly 256 tokens")
  }
}
