package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.functions.{gf, VectorKernels}

/** IVF-Flat vector index, Spark-first.
  *
  * The reference builds its IVF lists with a recursive divide-and-conquer
  * k-means over spill files (dnc/dnc.go:300-400) targeting ~10k vectors per
  * centroid, then re-assigns, drops small lists, and recenters
  * (dnc/dnc.go:170-574). Spark's shuffle already does what the spill-file
  * recursion does by hand, so the Spark-native design is flat:
  *
  *   1. sample ≤ sampleSize rows (reference SAMPLE_SIZE=50k, sampling.go)
  *   2. k-means with cosine assignment on the sample, k = ceil(N/listSize)
  *      (driver-side Lloyd's on the sample — the sample is bounded, so this
  *      is cheap and deterministic; the cluster-scale work stays in stages
  *      3-5 which are single distributed passes)
  *   3. assign every row to its nearest centroid — one broadcast argmax
  *      pass ([[NearestCentroid]], whole-stage codegen)
  *   4. drop lists with < minMembers members, re-home their rows to the
  *      surviving centroids (reference dnc.go:458-574)
  *   5. recenter each centroid to the member mean (reference dnc.go:402-456)
  *
  * Search (reference server/search.go:202-273): pick top-nprobe centroids
  * by cosine on the driver (centroid table is tiny), scan only those lists
  * — a partition-pruned read when the index is written
  * `partitionBy("centroid_id")` — then exact cosine top-k inside the probed
  * lists.
  */
object IvfIndex {

  /** Immutable driver-side centroid set (unit-normalized rows). */
  final case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
    /** Top-nprobe centroid ids for a query (nprobe<=0 → all). */
    def probe(query: Array[Float], nprobe: Int): Seq[Int] = {
      val qn = VectorKernels.l2Normalize(query)
      // SIMD when available: probing is the per-request serving hot step
      // (argmax over the centroid matrix); float-lane drift only reorders
      // near-exact centroid ties, which nprobe ranking tolerates
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        (VectorKernels.dotFast(qn, c), i)
      }
      val n = if (nprobe <= 0) centroids.length else math.min(nprobe, centroids.length)
      scored.sortBy { case (sim, i) => (-sim, i) }.take(n).map(_._2).toSeq
    }
  }

  /** Nearest-centroid argmax column: struct(centroid_id int, sim double). */
  def nearest_centroid(vec: Column, model: Model): Column =
    shim.column(NearestCentroid(shim.expression(vec), model.centroids))

  /** Driver-side Lloyd's k-means with cosine assignment over a bounded
    * sample. Deterministic: seeded sample, initial centers = first k
    * distinct sampled vectors, ties break to the lowest centroid id. */
  private[graft] def kmeansOnSample(
      sample: Array[Array[Float]], k: Int, maxIter: Int, seed: Long): Array[Array[Float]] = {
    val normed = sample.map(VectorKernels.l2Normalize)
    lloyd(normed, distinctInit(normed, k, seed), maxIter)
  }

  /** Reference-parity k-means init (k_means.go:19-212): seed a SUPERSET of
    * k×supersetMul random distinct centers, run Lloyd's, rank the clusters
    * by member count, truncate to the k largest, run Lloyd's again. The
    * oversized first pass lets dense regions claim several seeds before the
    * cut, which is the reference's guard against empty/poor random seeds. */
  private[graft] def kmeansSupersetTruncate(
      sample: Array[Array[Float]], k: Int, supersetMul: Int,
      maxIter: Int, seed: Long): Array[Array[Float]] = {
    val normed = sample.map(VectorKernels.l2Normalize)
    val superset = lloyd(normed, distinctInit(normed, k * supersetMul, seed), maxIter)
    if (superset.length <= k) return superset
    val counts = new Array[Long](superset.length)
    normed.foreach { v =>
      var best = 0; var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < superset.length) {
        val s = VectorKernels.dotUnit(v, superset(j))
        if (s > bestSim) { bestSim = s; best = j }
        j += 1
      }
      counts(best) += 1
    }
    val kept = superset.indices.sortBy(j => (-counts(j), j)).take(k).map(superset).toArray
    lloyd(normed, kept, maxIter)
  }

  /** First-k-distinct seeded init over pre-normalized vectors. */
  private def distinctInit(
      normed: Array[Array[Float]], k: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val shuffled = rnd.shuffle(normed.indices.toVector)
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
    shuffled.iterator.takeWhile(_ => init.length < k).foreach { i =>
      val key = normed(i).toSeq
      if (!seen(key)) { seen += key; init += normed(i) }
    }
    init.toArray
  }

  /** Lloyd's iterations over pre-normalized vectors from given centers. */
  private def lloyd(normed: Array[Array[Float]], init: Array[Array[Float]],
      maxIter: Int): Array[Array[Float]] = {
    var centers = init
    var iter = 0
    var moved = true
    val dim = if (normed.nonEmpty) normed(0).length else 0
    // The sample × (k × supersetMul) assignment is the build's driver-side
    // hot loop (sample 50k × 5k superset centers × dim at production
    // constants). Parallelize DETERMINISTICALLY: fixed chunk boundaries,
    // per-chunk partial sums, merged in chunk order — the result is
    // independent of thread scheduling. Dots go through the SIMD dispatch.
    val nThreads = math.max(1, math.min(Runtime.getRuntime.availableProcessors,
      math.max(1, normed.length / 1024)))
    val bounds = (0 to nThreads).map(t => normed.length.toLong * t / nThreads)
      .map(_.toInt)
    while (moved && iter < maxIter) {
      val cs = centers
      val partialSums = Array.ofDim[Array[Array[Double]]](nThreads)
      val partialCounts = Array.ofDim[Array[Long]](nThreads)
      val threads = (0 until nThreads).map { t =>
        val th = new Thread(() => {
          val sums = Array.fill(cs.length)(new Array[Double](dim))
          val counts = new Array[Long](cs.length)
          var i = bounds(t)
          while (i < bounds(t + 1)) {
            val v = normed(i)
            var best = 0; var bestSim = Double.NegativeInfinity
            var j = 0
            while (j < cs.length) {
              val s = VectorKernels.dotFast(v, cs(j))
              if (s > bestSim) { bestSim = s; best = j }
              j += 1
            }
            val acc = sums(best)
            var d = 0
            while (d < dim) { acc(d) += v(d); d += 1 }
            counts(best) += 1
            i += 1
          }
          partialSums(t) = sums
          partialCounts(t) = counts
        })
        th.start()
        th
      }
      threads.foreach(_.join())
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      var t = 0
      while (t < nThreads) { // fixed merge order => deterministic FP sums
        var j = 0
        while (j < centers.length) {
          val ps = partialSums(t)(j)
          val acc = sums(j)
          var d = 0
          while (d < dim) { acc(d) += ps(d); d += 1 }
          counts(j) += partialCounts(t)(j)
          j += 1
        }
        t += 1
      }
      val next = centers.indices.map { j =>
        if (counts(j) == 0) centers(j)
        else VectorKernels.l2Normalize(sums(j).map(x => (x / counts(j)).toFloat))
      }.toArray
      moved = next.zip(centers).exists { case (a, b) => !a.sameElements(b) }
      centers = next
      iter += 1
    }
    centers
  }

  final case class Params(
      listSize: Int = 10000, // reference CENTROID_SIZE (constants.go:8)
      sampleSize: Int = 50000, // reference SAMPLE_SIZE (constants.go:10)
      minMembersFrac: Double = 0.1, // drop threshold = listSize/10 (dnc.go:486)
      supersetMul: Int = 5, // reference SUPERSET_MUL (constants.go:12)
      splitSize: Int = 5, // reference SPLIT_SIZE (constants.go:11)
      maxIter: Int = 20,
      seed: Long = 42L)

  /** Collect a bounded seeded sample of the vector column. */
  private def sampleVecs(df: DataFrame, vecCol: String, n: Long,
      params: Params): Array[Array[Float]] = {
    val frac = math.min(1.0, params.sampleSize.toDouble * 1.2 / math.max(n, 1))
    df.select(vecCol).sample(withReplacement = false, frac, params.seed)
      .limit(params.sampleSize).collect()
      .map(_.getSeq[Float](0).toArray)
  }

  /** Build the index over `df(vecCol)`: returns (df + centroid_id + sim,
    * recentered model). One sample collect + two distributed passes — the
    * flat Spark-native path (k = ceil(N/listSize) in one k-means). */
  def build(df: DataFrame, vecCol: String, params: Params = Params()): (DataFrame, Model) = {
    val n = df.count()
    val k = math.max(1, math.ceil(n.toDouble / params.listSize).toInt)
    val sampled = sampleVecs(df, vecCol, n, params)
    val centers = kmeansSupersetTruncate(
      sampled, k, params.supersetMul, params.maxIter, params.seed)
    finalizeIndex(df, vecCol, centers, params)
  }

  /** Fully-distributed build: MLlib KMeans with cosine distance trains
    * over ALL rows (not a driver sample) — the path for corpora whose
    * cluster structure a 50k sample can't capture. Same finalize tail
    * (drop-small, recenter, assign) as [[build]]. MLlib's Lloyd's runs as
    * Spark jobs (broadcast centers + treeAggregate per iteration), so this
    * scales with the cluster; prefer [[build]] when the sample suffices —
    * one pass instead of maxIter passes. */
  def buildMllib(df: DataFrame, vecCol: String, params: Params = Params()): (DataFrame, Model) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = df.count()
    val k = math.max(2, math.ceil(n.toDouble / params.listSize).toInt)
    val feat = df.withColumn("_features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans()
      .setK(k).setDistanceMeasure("cosine").setSeed(params.seed)
      .setMaxIter(params.maxIter).setFeaturesCol("_features")
    val centers = km.fit(feat).clusterCenters
      .map(c => VectorKernels.l2Normalize(c.toArray.map(_.toFloat)))
    finalizeIndex(df, vecCol, centers, params)
  }

  /** M3 parity path (reference dnc/dnc.go:300-400): recursive
    * divide-and-conquer. Subsets ≤ listSize emit their sample mean as a
    * leaf centroid; larger subsets k-means-split into ≤ splitSize clusters
    * and recurse per cluster. Where the reference partitions rows into
    * spill files, we materialize the assignment column once per level and
    * recurse on partition-pruned filters of it — same data movement,
    * handled by the shuffle layer. The flat [[build]] is the preferred
    * production path (one assignment pass instead of one per level);
    * this exists for behavior parity with the reference index shape. */
  def buildDnc(df: DataFrame, vecCol: String, params: Params = Params()): (DataFrame, Model) = {
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    def recurse(sub: DataFrame, depth: Int): Unit = {
      val n = sub.count()
      if (n == 0) return
      val sampled = sampleVecs(sub, vecCol, n, params)
      if (n <= params.listSize) {
        // leaf: 1-means of the sample == its normalized mean (dataset.go:85-106)
        leaves += kmeansOnSample(sampled, 1, params.maxIter, params.seed)(0)
      } else {
        val k = math.min(params.splitSize,
          math.max(2, (n / params.listSize).toInt)) // dnc.go:324-335
        val centers = kmeansOnSample(sampled, k, params.maxIter, params.seed + depth)
        val assigned = assign(sub, vecCol, Model(centers))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        assigned.count() // materialize once; children read the cached split
        (0 until centers.length).foreach { c =>
          recurse(assigned.filter(col("centroid_id") === c)
            .drop("centroid_id", "centroid_sim"), depth + 1)
        }
        assigned.unpersist()
      }
    }
    recurse(df, 0)
    finalizeIndex(df, vecCol, leaves.toArray, params)
  }

  /** Shared tail (reference dnc.go:170-574): assign all rows, drop small
    * lists (keeping the largest), recenter to member means, re-assign. */
  private def finalizeIndex(df: DataFrame, vecCol: String,
      centers: Array[Array[Float]], params: Params): (DataFrame, Model) = {
    val model0 = Model(centers)

    // distributed pass 1: assign
    val assigned0 = assign(df, vecCol, model0)

    // drop small lists (keep at least the largest — dnc.go:478-480)
    val minMembers = math.max(1, (params.listSize * params.minMembersFrac).toInt)
    val counts = assigned0.groupBy("centroid_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val largest = if (counts.isEmpty) -1 else counts.maxBy(_._2)._1
    val survivors = counts.filter { case (id, c) => c >= minMembers || id == largest }.keys.toSeq.sorted
    val model1 =
      if (survivors.length == model0.k) model0
      else Model(survivors.map(centers).toArray)
    val assigned1 =
      if (survivors.length == model0.k) assigned0
      else assign(df, vecCol, model1)

    // distributed pass 2: recenter to member means (M7), then final assign ids
    val recentered = assigned1.groupBy("centroid_id")
      .agg(gf.vector_mean(col(vecCol)).as("mean_vec"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val model2 = Model(model1.centroids.indices.map { i =>
      recentered.get(i).map(VectorKernels.l2Normalize).getOrElse(model1.centroids(i))
    }.toArray)
    (assign(df, vecCol, model2), model2)
  }

  /** One broadcast argmax-cosine pass (J3): adds centroid_id + centroid_sim. */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("_nc", nearest_centroid(col(vecCol), model))
      .withColumn("centroid_id", col("_nc.centroid_id"))
      .withColumn("centroid_sim", col("_nc.sim"))
      .drop("_nc")

  /** Persist the index partitioned by list — searches with nprobe probe
    * only those directories (partition pruning). */
  def write(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** Persist the index with QUANTIZED vectors (the reference's storage
    * format: 8-byte header + 1 byte/dim ≈ 4× less scan IO than float32).
    * Search reads codes straight into the fused dequantize+cosine kernel
    * ([[graft.functions.CosineSimQ]]) — the float array is never
    * materialized. */
  def writeQuantized(assigned: DataFrame, vecCol: String, path: String): Unit =
    assigned
      .withColumn("qvec", gf.quantize_vec(col(vecCol))).drop(vecCol)
      .write.mode("overwrite").option("compression", "zstd")
      .partitionBy("centroid_id").parquet(path)

  /** Persist the centroid model as parquet (centroid_id, centroid) — the
    * engine twin of the reference's centroids table (its DB stores
    * centroid rows so serving restarts don't rebuild the index;
    * database.go / dnc.go persistence path). The model is tiny
    * (k × dim floats) → one file. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveModel]] parquet back into a Model (ordered by id). */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(spark.read.parquet(path).orderBy("centroid_id").collect()
      .map(_.getSeq[Float](1).toArray))

  /** nprobe search over a quantized on-disk index ([[writeQuantized]]):
    * partition-pruned scan of the probed lists, fused-kernel cosine
    * against the quantized query. */
  def searchQuantized(
      indexed: DataFrame, model: Model, idCol: String, qvecCol: String,
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val probeIds = model.probe(query, nprobe)
    val qLit = lit(VectorKernels.quantize(query))
    indexed
      .filter(col("centroid_id").isin(probeIds: _*))
      .select(col(idCol), gf.cosine_sim_q(col(qvecCol), qLit).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** nprobe search over an assigned/partitioned index DataFrame.
    * Deterministic tie-break (sim DESC, id ASC) — SURVEY §4.3. */
  def search(
      indexed: DataFrame, model: Model, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val probeIds = model.probe(query, nprobe)
    val qLit = lit(query)
    indexed
      .filter(col("centroid_id").isin(probeIds: _*))
      .select(col(idCol),
        gf.cosine_sim(col(vecCol), qLit.cast("array<float>")).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batched probe-scoring — every query in ONE Spark job. The per-query
    * driver loop ([[search]] in a `.map` over collected queries) pays
    * ~100-300 ms of planning + scheduling per query regardless of data
    * size; a bounded query set amortizes it the way
    * `SearchService.searchBatch` does for the serving tier: the
    * (query × probed-centroid) table — rows = Σ nprobe, tiny — is
    * BROADCAST and hash-joined against the index on centroid_id, so each
    * query still scores ONLY its own probed lists and the index scans
    * once for the whole batch. Returns `indexed`'s columns plus
    * (qid, sim); callers filter (labels, self) before ranking. */
  def scoreBatch(indexed: DataFrame, model: Model, vecCol: String,
      queries: Seq[(Long, Array[Float])], nprobe: Int): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "empty query batch")
    val probes = queries.flatMap { case (qid, qv) =>
      model.probe(qv, nprobe).map(cid => (qid, cid, qv.toSeq))
    }
    val qdf = probes.toDF("qid", "probe_cid", "qvec")
    indexed.join(broadcast(qdf), col("centroid_id") === col("probe_cid"))
      .withColumn("sim", gf.cosine_sim(col(vecCol), col("qvec")))
      .drop("probe_cid", "qvec")
  }

  /** Per-query top-k over [[scoreBatch]] rows via the bounded
    * [[gf.TopKAgg]] — ≤ k rows per (task, query) cross the exchange,
    * never a per-query corpus window. (sim DESC, id ASC) tie order,
    * [[search]]'s contract. Emits (qid, idCol, sim, r). */
  def topKPerQuery(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(gf.top_k_by(col("sim"), col(idCol), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("qid"), col("t._2").as(idCol), col("t._1").as("sim"),
        (col("pos") + 1).as("r"))

  /** [[search]] for a whole query batch in one job:
    * [[scoreBatch]] → [[topKPerQuery]]. */
  def searchBatch(indexed: DataFrame, model: Model, idCol: String,
      vecCol: String, queries: Seq[(Long, Array[Float])], k: Int,
      nprobe: Int): DataFrame =
    topKPerQuery(scoreBatch(indexed, model, vecCol, queries, nprobe), idCol, k)

  /** Auto-tune nprobe to a recall target — the knob every IVF deployment
    * has to pick, chosen here by MEASUREMENT on a bounded query sample
    * instead of folklore: exact brute-force truth per sample query, then
    * a binary search over nprobe (mean recall@k is monotone in nprobe:
    * the probed pool only GROWS, scoring is exact, and a true top-k
    * member in the pool is only ever displaced by other true top-k
    * members — so recall per query is |true ∩ pool|, non-decreasing).
    * Returns the MINIMAL nprobe whose mean recall meets the target,
    * plus the measured (nprobe → recall) points for the report. Driver
    * cost: O(|sample| · log C) searches — sample and C are bounded, the
    * same budget the bench's recall micro already spends. */
  def calibrateNprobe(
      indexed: DataFrame, model: Model, idCol: String, vecCol: String,
      sampleQueries: Seq[Array[Float]], k: Int,
      targetRecall: Double): (Int, Map[Int, Double]) = {
    require(sampleQueries.nonEmpty, "need sample queries to calibrate")
    val nC = model.centroids.length
    val truth = sampleQueries.map { q =>
      search(indexed, model, idCol, vecCol, q, k, nC)
        .collect().map(_.getLong(0)).toSet
    }
    val memo = scala.collection.mutable.Map[Int, Double]()
    def recallAt(np: Int): Double = memo.getOrElseUpdate(np, {
      val hits = sampleQueries.zip(truth).map { case (q, t) =>
        val got = search(indexed, model, idCol, vecCol, q, k, np)
          .collect().map(_.getLong(0)).toSet
        if (t.isEmpty) 1.0 else (got & t).size.toDouble / t.size
      }
      hits.sum / hits.length
    })
    var lo = 1
    var hi = nC
    if (recallAt(1) >= targetRecall) hi = 1
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (recallAt(mid) >= targetRecall) hi = mid else lo = mid + 1
    }
    (hi, memo.toMap)
  }
}

/** `nearest_centroid(array<float>)` → `struct(centroid_id int, sim double)`
  * — broadcast argmax over a centroid matrix captured in the plan, the J3
  * assignment kernel (reference compute/cosine.go:70-125). Codegen emits a
  * single static call against the matrix reference object. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(a: Any): Any =
    NearestCentroid.argmax(a.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroidMatrix", centroids, "float[][]")
    // NOTE: the static forwarder for a companion method named `eval` is
    // suppressed (clashes with Expression.eval), so the kernel must have a
    // distinct name for Janino to resolve it.
    defineCodeGen(ctx, ev,
      a => s"graft.index.NearestCentroid.argmax($a, $matRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // the matrix is part of semantic equality but Array lacks it — compare contents
  override def equals(o: Any): Boolean = o match {
    case NearestCentroid(c, m) =>
      c == child && m.length == centroids.length &&
        m.zip(centroids).forall { case (x, y) => x.sameElements(y) }
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + centroids.length
}

object NearestCentroid {
  /** argmax_j cosine(v, C_j); centroid rows are pre-normalized. SIMD
    * dot when the Vector API is present (assignment is the heaviest
    * index-build stage — rows × k × dim); float-lane drift only affects
    * genuine near-ties between centroids, which any assignment is free
    * to break either way. */
  def argmax(v: ArrayData, centroids: Array[Array[Float]]): InternalRow = {
    val x = v.toFloatArray()
    val xn = VectorKernels.l2Normalize(x)
    var best = 0
    var bestSim = Double.NegativeInfinity
    var j = 0
    while (j < centroids.length) {
      val s = VectorKernels.dotFast(xn, centroids(j))
      if (s > bestSim) { bestSim = s; best = j }
      j += 1
    }
    InternalRow(best, bestSim)
  }
}
