package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations._

/** Data-validation surfaces — the "gate before you spend GPU-hours"
  * tier of a training pipeline: declarative expectations over a table
  * (q112) and referential-integrity audit across the star schema (q113).
  * The reference encodes these invariants as DB schema constraints
  * (database/model.go:48-67 unique names, NOT NULL columns, FK
  * relations); parquet has no constraint engine, so a corpus-scale
  * pipeline has to CHECK them — once per scan, never per-row-per-rule. */
object AuditQueries {

  /** Corpus expectations suite: schema-shaped checks over `documents` in
    * ONE aggregate pass ([[Expectations.run]] compiles all checks into a
    * single agg; uniqueness rides the same pass via Expand). The report
    * is |checks| rows, exchange-free above the 1-row aggregate. */
  def q112Expectations(s: SparkSession, dir: String): DataFrame =
    Expectations.run(Tables.load(s, dir, "documents"), Seq(
      notNull("doc_id"),
      unique("doc_id"),
      notNull("text"),
      inSet("lang", Seq("en", "es", "de", "fr", "zh")),
      nonNegative("n_chars"),
      holds("chars_match(n_chars,text)", col("n_chars") === length(col("text")))))

  /** One FK edge: children = non-null child keys, orphans = child keys
    * with no parent. LEFT join against the DISTINCT parent-key set, so
    * the verdict and the count come from one join + one aggregate; small
    * dims broadcast, big ones shuffle on the key — either way one pass
    * over the child table per edge, no per-row lookups. */
  private[graft] def fkEdge(name: String, child: DataFrame, key: String,
      parent: DataFrame, pkey: String): DataFrame =
    child.select(col(key).as("k")).filter(col("k").isNotNull)
      .join(parent.select(col(pkey).as("k")).distinct()
        .withColumn("_hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("children"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("orphans"))
      .select(lit(name).as("edge"), col("children"),
        coalesce(col("orphans"), lit(0L)).as("orphans"),
        (coalesce(col("orphans"), lit(0L)) === 0L).as("pass"))

  /** Referential-integrity audit over the TPC-H-ish star: every FK edge
    * the query surfaces join on, each certified by one scan-and-join. */
  def q113FkAudit(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.load(s, dir, n)
    fkEdge("lineitem.l_orderkey->orders", t("lineitem"), "l_orderkey",
        t("orders"), "o_orderkey")
      .unionByName(fkEdge("lineitem.l_partkey->part", t("lineitem"),
        "l_partkey", t("part"), "p_partkey"))
      .unionByName(fkEdge("lineitem.l_suppkey->supplier", t("lineitem"),
        "l_suppkey", t("supplier"), "s_suppkey"))
      .unionByName(fkEdge("orders.o_custkey->customer", t("orders"),
        "o_custkey", t("customer"), "c_custkey"))
      .unionByName(fkEdge("customer.c_nationkey->nation", t("customer"),
        "c_nationkey", t("nation"), "n_nationkey"))
  }

  /** Ingestion-order drift monitor — "did my crawl's quality move over
    * time": each source's documents split into tenths of their doc_id
    * (= arrival) order, with per-decile mean quality and token length
    * plus the drift from the source's overall mean. The shape every
    * continuous-ingest pipeline dashboards before a bad crawl config
    * poisons a month of data.
    *
    * Scale: ranking every source's docs by arrival runs through ONE
    * range exchange ([[operators.RankOps.globalRowNumberPer]] — no
    * per-source single-task sort); decile arithmetic is integer math on
    * broadcast per-source counts; both aggregates are map-side partial.
    * Drift is emitted as a magnitude, thresholding is the reader's
    * policy. */
  def q114DriftMonitor(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RankOps
    val scored = Tables.loadP(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        round(PipelineQueries.qualityExpr(col("text")), 4).as("q"),
        graft.functions.gf.token_count(col("text")).cast("long").as("toks"))
    val ranked = RankOps.globalRowNumberPer(scored, "source",
      Seq(col("doc_id").asc), "r")
    val sizes = ranked.groupBy("source").agg(count(lit(1)).as("_n"))
    val perDec = ranked.join(broadcast(sizes), "source")
      .withColumn("decile", expr("CAST((r - 1) * 10 div _n AS INT)"))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("q"), 4).as("mean_q"),
        round(avg("toks"), 2).as("mean_toks"))
    // per-source mean off the PINNED ranked rows, not `scored` (r18):
    // RankOps pins (doc_id, source, q, toks) anyway, and aggregating the
    // unpinned frame re-ran the scan and the qualityExpr regex pass a
    // second time over the whole corpus for the same numbers
    val perSrc = ranked.groupBy("source").agg(avg("q").as("_src_q"))
    perDec.join(broadcast(perSrc), "source")
      .select(col("source"), col("decile"), col("n_docs"),
        col("mean_q"), col("mean_toks"),
        round(abs(col("mean_q") - col("_src_q")), 4).as("drift"))
  }

  /** Windowed drift monitor — q114's incremental refinement and the
    * batch twin of [[graft.streaming.Streams.streamingDriftMonitor]]:
    * documents fall into fixed arrival buckets (doc_id div 50, the
    * batch stand-in for event-time windows) and each (source, bucket)
    * reports its mean quality plus the drift from the source's
    * CUMULATIVE mean through that bucket, inclusive. Where q114's
    * deciles need the FINAL corpus size (a retrospective dashboard),
    * every row here is final the moment its bucket completes — which
    * is exactly what lets the streaming twin emit identical rows as
    * the watermark closes each window, and what an alerting tier needs
    * (page when the newest bucket drifts, not at month-end).
    *
    * Scale: the only corpus-sized pass is the map-side partial
    * aggregate down to (source, bucket) rows; the cumulative window
    * runs over those AGGREGATE rows (buckets per source, never
    * documents — the r10 mega-key lesson does not apply to
    * aggregate-first shapes) with a MONOTONE running-sum frame, the
    * incremental kind PlanRegressionSpec's sliding-frame ban permits. */
  def q136DriftWindows(s: SparkSession, dir: String): DataFrame =
    driftWindowsAt(s, dir, 50L)

  /** q136's pipeline at an arbitrary arrival-bucket width — the knob
    * the `drift_windows(dir[, bucket_w])` TVF exposes to SQL callers
    * (a dashboard picks its granularity per query; the registry entry
    * stays the oracle-pinned width-50 instance). */
  private[graft] def driftWindowsAt(s: SparkSession, dir: String,
      bucketW: Long): DataFrame = {
    require(bucketW > 0, s"bucket width must be positive, got $bucketW")
    val scored = Tables.loadP(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        round(PipelineQueries.qualityExpr(col("text")), 4).as("q"))
    driftWindows(scored, expr(s"doc_id div $bucketW"))
  }

  /** q137: the EVENT-TIME variant of q136 — tumbling wall-clock
    * windows over the events stream table instead of arrival buckets
    * over doc_ids. Per (event_type, 6h window of `ts`): event count,
    * mean value (in hundredth units — see [[driftWindowsTsAt]]), and
    * the drift from the type's cumulative mean through that window,
    * inclusive. This is the true SQL/batch door to
    * [[graft.streaming.Streams.streamingDriftMonitor]]'s semantics:
    * same keying (a bounded source dimension), same tumbling
    * floor-div event-time windows (`unix_micros(ts) div window_us` ==
    * the monitor's floorDiv for the non-negative domain), same
    * inclusive-cumulative drift — the monitor replays a live stream of
    * exactly this shape window-for-window. Same aggregate-first scale
    * shape as q136: one map-side partial agg is the only corpus pass;
    * the cumulative window runs over per-(type, window) AGGREGATE rows
    * with a MONOTONE frame. */
  def q137DriftWindowsTs(s: SparkSession, dir: String): DataFrame =
    driftWindowsTsAt(s, dir, 360L)

  /** q137's pipeline at an arbitrary window width in minutes — the
    * knob the `drift_windows_ts(dir[, window_minutes])` TVF exposes
    * (the registry entry stays the oracle-pinned 360-minute
    * instance). The metric is the event value in its native
    * HUNDREDTHS (the generator emits 2-decimal values): kept integral,
    * every per-window sum is exact in a double, so summation order —
    * Spark's partial-agg tree vs the oracle's sequential fold — cannot
    * move a mean across a round-at-4 boundary (a raw `round(value,4)`
    * feed failed exactly that way: windows with n_docs=16 put the
    * true mean on a 5th-decimal half, and cross-engine ulp noise
    * flipped the rounding). Means/drift are reported in the same
    * hundredth units. */
  private[graft] def driftWindowsTsAt(s: SparkSession, dir: String,
      windowMinutes: Long): DataFrame = {
    require(windowMinutes > 0,
      s"window width must be positive, got $windowMinutes")
    val winUs = windowMinutes * 60L * 1000000L
    val scored = Tables.load(s, dir, "events")
      .select(col("event_type").as("source"), col("ts"),
        round(col("value") * 100, 0).as("q"))
    driftWindows(scored, expr(s"unix_micros(ts) div $winUs"))
  }

  /** Per-(source, bucket) n / mean quality / |mean − running mean
    * through the bucket|. `bucketExpr` maps a row to its arrival
    * bucket; everything after the first aggregate is one row per
    * NON-EMPTY (source, bucket) — empty buckets contribute no row and
    * no cumulative mass, the streaming twin's contract too. */
  private[graft] def driftWindows(scored: DataFrame,
      bucketExpr: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perB = scored.groupBy(col("source"), bucketExpr.as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum("q").as("_sq"))
    val w = Window.partitionBy("source").orderBy("bucket")
    perB
      .withColumn("_cs", sum("_sq").over(w))
      .withColumn("_cn", sum("n_docs").over(w))
      .select(col("source"), col("bucket"), col("n_docs"),
        round(col("_sq") / col("n_docs"), 4).as("mean_q"),
        round(abs(col("_sq") / col("n_docs") - col("_cs") / col("_cn")), 4)
          .as("drift"))
  }

  /** Embedding-norm outlier report — the vector-sanity audit (corrupt,
    * zeroed, or mis-scaled vectors show up as L2-norm outliers long
    * before a recall regression does): per label, n / mean / stddev of
    * the norm plus how many vectors sit beyond 2σ and 3σ. The norm is
    * a row-local f64 fold over the array (same fold order both
    * engines); per-label moments come from ONE partial-merged
    * aggregate, and the outlier counts join the |labels|-sized moment
    * table back broadcast — two scans of the vectors, zero corpus
    * shuffles beyond the label agg. */
  def q115VectorOutliers(s: SparkSession, dir: String): DataFrame =
    vectorOutliers(Tables.loadP(s, dir, "embeddings"))

  private[graft] def vectorOutliers(vecs: DataFrame): DataFrame = {
    val norm = sqrt(expr(
      "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
    val normed = vecs.select(col("label"), norm.as("nrm"))
    val stats = normed.groupBy("label")
      .agg(count(lit(1)).as("n"), avg("nrm").as("_mu"),
        stddev_samp(col("nrm")).as("_sd"))
    normed.join(broadcast(stats), "label")
      // z rounded before thresholding: the count must not hinge on the
      // engines' last-ulp differences in the group moments
      .withColumn("_z", round(abs(col("nrm") - col("_mu")) / col("_sd"), 6))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg("nrm"), 4).as("mean_norm"),
        round(stddev_samp(col("nrm")), 4).as("sd_norm"),
        sum(when(col("_z") > 2.0, 1L).otherwise(0L)).as("n_out2"),
        sum(when(col("_z") > 3.0, 1L).otherwise(0L)).as("n_out3"))
  }

  /** One key family's skew profile: distinct keys, mean/max per-key
    * multiplicity, the skew ratio a join/agg planner cares about, and
    * the heaviest key. The top key rides the same aggregate as a
    * zero-padded `count:key` string max — deterministic (ties break on
    * the key string) and engine-portable, no second pass and no sort.
    * Per-key counts are a map-side-combined groupBy on the key alone,
    * so the audit shuffles one row per distinct key, never the table. */
  private[graft] def keySkew(df: DataFrame, key: String, tag: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"), sum("c").as("_tot"),
        max("c").as("max_cnt"),
        max(concat(lpad(col("c").cast("string"), 12, "0"), lit(":"), col("k")))
          .as("_top"))
      .select(lit(tag).as("keyspace"), col("n_keys"),
        round(col("_tot").cast("double") / col("n_keys"), 4).as("mean_cnt"),
        col("max_cnt"),
        round(col("max_cnt") / (col("_tot").cast("double") / col("n_keys")), 4)
          .as("skew"),
        substring(col("_top"), 14, 1000000).as("top_key"))

  /** Join-key skew audit across the tables the query surfaces shuffle
    * on — the pre-flight check before a 100 TB join: a `skew` of ~1
    * means hash partitions balance; a hot key (max_cnt ≫ mean) is the
    * signal to salt ([[operators.SkewOps]]) or let AQE split. Five
    * bounded aggregates, unioned; nothing here moves table rows. */
  def q116SkewReport(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.load(s, dir, n)
    keySkew(t("lineitem"), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(keySkew(t("lineitem"), "l_suppkey", "lineitem.l_suppkey"))
      .unionByName(keySkew(t("orders"), "o_custkey", "orders.o_custkey"))
      .unionByName(keySkew(t("documents"), "source", "documents.source"))
      .unionByName(keySkew(t("events"), "user_id", "events.user_id"))
  }

  /** Embedding-space cluster-health audit — the "is this corpus's
    * vector space actually separable" pre-flight before spending
    * index-build or contrastive-training budget on it. Per label:
    * member count, cohesion (mean cosine of members to their own
    * centroid), the nearest OTHER centroid's similarity, and the
    * silhouette-style margin (cohesion − nearest-other). A margin near
    * zero means two labels overlap — the signal that IVF lists will
    * leak neighbors and hard negatives will be mislabeled positives.
    *
    * Scale: centroids are |labels| rows from one partial-merged
    * [[gf.vector_mean]] aggregate, PINNED (q94's convention — float
    * partial-merge order must not differ between the three consumers),
    * then BROADCAST for member scoring (one corpus pass, codegen'd
    * cosine) and self-joined at |labels|² for separation — the corpus
    * shuffles only per-label partial sums. */
  def q122ClusterStats(s: SparkSession, dir: String): DataFrame =
    clusterStats(Tables.loadP(s, dir, "embeddings").select("label", "embedding"))

  private[graft] def clusterStats(e: DataFrame): DataFrame = {
    import graft.functions.gf
    // bounded pin: one row per label — the registered tag is the
    // broadcast net's per-side proof for both centroid joins
    val cent = graft.operators.Pins.pin(
      e.groupBy("label").agg(gf.vector_mean(col("embedding")).as("centroid")),
      "centroids:label-rows")
    val cohesion = e.join(broadcast(cent), "label")
      .select(col("label"),
        (round(gf.cosine_sim(col("embedding"), col("centroid")), 4) + 0.0).as("cs"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), (round(avg("cs"), 4) + 0.0).as("cohesion"))
    val sep = cent.as("a")
      .join(broadcast(cent).as("b"), col("a.label") =!= col("b.label"))
      .select(col("a.label").as("label"),
        (round(gf.cosine_sim(col("a.centroid"), col("b.centroid")), 4) + 0.0)
          .as("cc"))
      .groupBy("label").agg(max("cc").as("nearest_sim"))
    // LEFT: a single-label corpus has no "other" centroid — report the
    // cohesion row with null separation instead of an empty audit
    cohesion.join(broadcast(sep), Seq("label"), "left")
      .select(col("label"), col("n"), col("cohesion"), col("nearest_sim"),
        (round(col("cohesion") - col("nearest_sim"), 4) + 0.0).as("margin"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_expectations" -> q112Expectations _,
    "q113_fk_audit" -> q113FkAudit _,
    "q114_drift_monitor" -> q114DriftMonitor _,
    "q136_drift_windows" -> q136DriftWindows _,
    "q137_drift_windows_ts" -> q137DriftWindowsTs _,
    "q115_vector_outliers" -> q115VectorOutliers _,
    "q116_skew_report" -> q116SkewReport _,
    "q122_cluster_stats" -> q122ClusterStats _
  )

  private[graft] val scoredCte: String =
    """scored AS (
      |  SELECT doc_id, source, round(CASE WHEN len = 0 OR toks = 0 THEN 0.0
      |    ELSE (lenScore + alphaScore + punctScore + wordScore) / 4.0 END, 4) AS q,
      |    CAST(toks AS BIGINT) AS toks
      |  FROM (
      |    SELECT doc_id, source, len, toks,
      |      CASE WHEN len >= 100 AND len <= 20000 THEN 1.0
      |           WHEN len >= 20 THEN 0.5 ELSE 0.0 END AS lenScore,
      |      CASE WHEN alphaRatio >= 0.6 THEN 1.0 ELSE alphaRatio / 0.6 END AS alphaScore,
      |      CASE WHEN punctRatio <= 0.1 THEN 1.0
      |           ELSE greatest(0.0, 1.0 - (punctRatio - 0.1) * 5) END AS punctScore,
      |      CASE WHEN meanWord >= 3 AND meanWord <= 12 THEN 1.0 ELSE 0.5 END AS wordScore
      |    FROM (
      |      SELECT doc_id, source,
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
      |      FROM documents)))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q122_cluster_stats" ->
      """WITH cent AS (
        |  SELECT label, list(CAST(m AS REAL) ORDER BY idx) AS centroid
        |  FROM (SELECT label, idx, avg(val) AS m
        |        FROM (SELECT label, unnest(embedding) AS val,
        |                unnest(generate_series(1, len(embedding))) AS idx
        |              FROM embeddings)
        |        GROUP BY label, idx)
        |  GROUP BY label),
        |coh AS (
        |  SELECT v.label, count(*) AS n,
        |    round(avg(round(CAST(list_cosine_similarity(v.embedding,
        |      c.centroid) AS DOUBLE), 4) + 0), 4) + 0 AS cohesion
        |  FROM embeddings v JOIN cent c USING (label)
        |  GROUP BY v.label),
        |sep AS (
        |  SELECT a.label,
        |    max(round(CAST(list_cosine_similarity(a.centroid, b.centroid)
        |      AS DOUBLE), 4) + 0) AS nearest_sim
        |  FROM cent a JOIN cent b ON a.label <> b.label
        |  GROUP BY a.label)
        |SELECT label, n, cohesion, nearest_sim,
        |  round(cohesion - nearest_sim, 4) + 0 AS margin
        |FROM coh LEFT JOIN sep USING (label)""".stripMargin,
    "q114_drift_monitor" ->
      s"""WITH $scoredCte,
         |r AS (
         |  SELECT source, q, toks,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM scored),
         |perdec AS (
         |  SELECT source, CAST((r - 1) * 10 // n AS INT) AS decile,
         |    count(*) AS n_docs, round(avg(q), 4) AS mean_q,
         |    round(avg(toks), 2) AS mean_toks
         |  FROM r GROUP BY 1, 2),
         |persrc AS (SELECT source, avg(q) AS src_q FROM scored GROUP BY source)
         |SELECT source, decile, n_docs, mean_q, mean_toks,
         |  round(abs(mean_q - src_q), 4) AS drift
         |FROM perdec JOIN persrc USING (source)""".stripMargin,
    "q136_drift_windows" ->
      s"""WITH $scoredCte,
         |perb AS (
         |  SELECT source, doc_id // 50 AS bucket,
         |    count(*) AS n_docs, sum(q) AS sq
         |  FROM scored GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, bucket, n_docs, sq,
         |    sum(sq) OVER (PARTITION BY source ORDER BY bucket) AS cs,
         |    sum(n_docs) OVER (PARTITION BY source ORDER BY bucket) AS cn
         |  FROM perb)
         |SELECT source, bucket, n_docs,
         |  round(sq / n_docs, 4) AS mean_q,
         |  round(abs(sq / n_docs - cs / cn), 4) AS drift
         |FROM cum""".stripMargin,
    // 21600000000 us = the 360-minute window the registry instance
    // pins; value rides in integral hundredths so per-window sums are
    // exact doubles in BOTH engines (order-independent — see
    // driftWindowsTsAt)
    "q137_drift_windows_ts" ->
      """WITH perb AS (
        |  SELECT event_type AS source,
        |    epoch_us(ts) // 21600000000 AS bucket,
        |    count(*) AS n_docs, sum(round(value * 100, 0)) AS sq
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, bucket, n_docs, sq,
        |    sum(sq) OVER (PARTITION BY source ORDER BY bucket) AS cs,
        |    sum(n_docs) OVER (PARTITION BY source ORDER BY bucket) AS cn
        |  FROM perb)
        |SELECT source, bucket, n_docs,
        |  round(sq / n_docs, 4) AS mean_q,
        |  round(abs(sq / n_docs - cs / cn), 4) AS drift
        |FROM cum""".stripMargin,
    "q115_vector_outliers" ->
      """WITH normed AS (
        |  SELECT label,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |stats AS (
        |  SELECT label, count(*) AS cnt, avg(nrm) AS mu, stddev_samp(nrm) AS sd
        |  FROM normed GROUP BY label)
        |SELECT label, CAST(cnt AS BIGINT) AS n, round(mu, 4) AS mean_norm,
        |  round(sd, 4) AS sd_norm,
        |  CAST(sum(CASE WHEN round(abs(nrm - mu) / sd, 6) > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out2,
        |  CAST(sum(CASE WHEN round(abs(nrm - mu) / sd, 6) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out3
        |FROM normed JOIN stats USING (label)
        |GROUP BY label, cnt, mu, sd""".stripMargin,
    "q116_skew_report" -> {
      def fam(table: String, key: String): String =
        s"""SELECT '$table.$key' AS keyspace,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  round(CAST(sum(c) AS DOUBLE) / count(*), 4) AS mean_cnt,
           |  CAST(max(c) AS BIGINT) AS max_cnt,
           |  round(max(c) / (CAST(sum(c) AS DOUBLE) / count(*)), 4) AS skew,
           |  substr(max(lpad(CAST(c AS VARCHAR), 12, '0') || ':' || k), 14) AS top_key
           |FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS c
           |      FROM $table WHERE $key IS NOT NULL GROUP BY 1)""".stripMargin
      Seq(fam("lineitem", "l_orderkey"), fam("lineitem", "l_suppkey"),
        fam("orders", "o_custkey"), fam("documents", "source"),
        fam("events", "user_id")).mkString("\nUNION ALL\n")
    },
    "q112_expectations" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents)
        |SELECT 'not_null(doc_id)' AS "check", n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id IS NULL) AS violations,
        |  (SELECT count(*) FROM documents WHERE doc_id IS NULL) = 0 AS pass FROM n
        |UNION ALL
        |SELECT 'unique(doc_id)', n_rows,
        |  (SELECT CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents),
        |  (SELECT count(*) - count(DISTINCT doc_id) FROM documents) = 0 FROM n
        |UNION ALL
        |SELECT 'not_null(text)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE text IS NULL),
        |  (SELECT count(*) FROM documents WHERE text IS NULL) = 0 FROM n
        |UNION ALL
        |SELECT 'in_set(lang)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE lang IS NULL OR lang NOT IN ('en','es','de','fr','zh')),
        |  (SELECT count(*) FROM documents
        |     WHERE lang IS NULL OR lang NOT IN ('en','es','de','fr','zh')) = 0 FROM n
        |UNION ALL
        |SELECT 'non_negative(n_chars)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE n_chars IS NULL OR NOT (n_chars >= 0)),
        |  (SELECT count(*) FROM documents
        |     WHERE n_chars IS NULL OR NOT (n_chars >= 0)) = 0 FROM n
        |UNION ALL
        |SELECT 'chars_match(n_chars,text)', n_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE n_chars IS NULL OR text IS NULL OR n_chars <> length(text)),
        |  (SELECT count(*) FROM documents
        |     WHERE n_chars IS NULL OR text IS NULL OR n_chars <> length(text)) = 0 FROM n""".stripMargin,
    "q113_fk_audit" ->
      """SELECT 'lineitem.l_orderkey->orders' AS edge,
        |  CAST(count(*) AS BIGINT) AS children,
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans,
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0 AS pass
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  ON c.l_orderkey = p.k WHERE c.l_orderkey IS NOT NULL
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |  ON c.l_partkey = p.k WHERE c.l_partkey IS NOT NULL
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |  ON c.l_suppkey = p.k WHERE c.l_suppkey IS NOT NULL
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |  ON c.o_custkey = p.k WHERE c.o_custkey IS NOT NULL
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) = 0
        |FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |  ON c.c_nationkey = p.k WHERE c.c_nationkey IS NOT NULL""".stripMargin
  )
}
