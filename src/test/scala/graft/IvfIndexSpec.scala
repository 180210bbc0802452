package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{gf, VectorKernels}
import graft.index.IvfIndex

/** IVF index build/search: codegen health, assignment invariant, recall. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf0001

  private def embeddings = Tables.load(spark, dir, "embeddings")

  test("nearest_centroid codegen compiles (no interpreted fallback)") {
    // With fallback disabled a broken doGenCode throws instead of silently
    // degrading every assignment pass to interpreted eval.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val model = IvfIndex.Model(Array(
        VectorKernels.l2Normalize(Array.fill(64)(1f)),
        VectorKernels.l2Normalize(Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f))))
      val out = IvfIndex.assign(embeddings.limit(100), "embedding", model)
        .groupBy("centroid_id").count().collect()
      assert(out.map(_.getLong(1)).sum == 100L)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("assignment equals driver-side argmax") {
    val model = IvfIndex.Model(Array(
      VectorKernels.l2Normalize(Array.tabulate(64)(i => (i + 1).toFloat)),
      VectorKernels.l2Normalize(Array.tabulate(64)(i => (64 - i).toFloat)),
      VectorKernels.l2Normalize(Array.fill(64)(1f))))
    val rows = IvfIndex.assign(embeddings.limit(200), "embedding", model)
      .select("embedding", "centroid_id").collect()
    rows.foreach { r =>
      val v = VectorKernels.l2Normalize(r.getSeq[Float](0).toArray)
      // same kernel dispatch as the distributed argmax (SIMD when present)
      val sims = model.centroids.map(c => VectorKernels.dotFast(v, c))
      val best = sims.indices.maxBy(i => (sims(i), -i))
      assert(r.getInt(1) == best)
    }
  }

  test("nprobe=all search equals brute-force top-k") {
    val query = embeddings.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    val (indexed, model) = IvfIndex.build(embeddings, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    val ivf = IvfIndex.search(indexed, model, "vec_id", "embedding", query,
      k = 10, nprobe = -1).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = embeddings
      .select(col("vec_id"), gf.cosine_sim(col("embedding"), lit(query).cast("array<float>")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("divide-and-conquer build yields bounded lists and searchable index") {
    val (indexed, model) = IvfIndex.buildDnc(embeddings, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    assert(model.k >= 5, s"expected >= ceil(500/100) lists, got ${model.k}")
    val counts = indexed.groupBy("centroid_id").count().collect()
    assert(counts.map(_.getLong(1)).sum == 500L)
    // nprobe=all over the dnc index must equal brute force
    val query = embeddings.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    val ivf = IvfIndex.search(indexed, model, "vec_id", "embedding", query,
      k = 10, nprobe = -1).collect().map(_.getLong(0)).toSeq
    val brute = embeddings
      .select(col("vec_id"), gf.cosine_sim(col("embedding"), lit(query).cast("array<float>")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
  }

  test("superset-truncate init returns exactly k centers covering the sample") {
    val sample = Array.tabulate(200)(i =>
      Array.tabulate(8)(d => ((i % 4) * 10 + d).toFloat + i * 0.001f))
    val centers = IvfIndex.kmeansSupersetTruncate(sample, 4, 5, 50, 42L)
    assert(centers.length == 4)
    // 4 well-separated generators → every sample point close to a center
    sample.map(graft.functions.VectorKernels.l2Normalize).foreach { v =>
      val best = centers.map(c => graft.functions.VectorKernels.dotUnit(v, c)).max
      assert(best > 0.99, s"uncovered point, best sim $best")
    }
  }

  test("quantized on-disk index: smaller files, high-recall fused-kernel search") {
    val (indexed, model) = IvfIndex.build(embeddings, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    val fDir = java.nio.file.Files.createTempDirectory("ivf_f").toString
    val qDir = java.nio.file.Files.createTempDirectory("ivf_q").toString
    IvfIndex.write(indexed.select("vec_id", "embedding", "centroid_id"), fDir)
    IvfIndex.writeQuantized(indexed.select("vec_id", "embedding", "centroid_id"),
      "embedding", qDir)

    def dirSize(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    assert(dirSize(qDir) < dirSize(fDir) / 2,
      s"quantized ${dirSize(qDir)} vs float ${dirSize(fDir)}")

    val query = embeddings.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    val qIdx = spark.read.parquet(qDir)
    val got = IvfIndex.searchQuantized(qIdx, model, "vec_id", "qvec", query,
      k = 10, nprobe = -1).collect().map(_.getLong(0)).toSet
    val brute = embeddings
      .select(col("vec_id"), gf.cosine_sim(col("embedding"), lit(query).cast("array<float>")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    // quantization perturbs sims by <= ~range/255 per dim; top-10 overlap
    // must stay high and the self-hit exact
    assert(got.contains(7L))
    assert((got intersect brute).size >= 8, s"recall ${(got intersect brute).size}/10")
  }

  test("model save/load round-trips exactly; loaded model searches identically") {
    val (indexed, model) = IvfIndex.build(embeddings, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    val mDir = java.nio.file.Files.createTempDirectory("ivf_m").toString
    IvfIndex.saveModel(spark, model, mDir)
    val loaded = IvfIndex.loadModel(spark, mDir)
    assert(loaded.k == model.k)
    loaded.centroids.zip(model.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val query = embeddings.filter(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).toArray
    val a = IvfIndex.search(indexed, model, "vec_id", "embedding", query, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = IvfIndex.search(indexed, loaded, "vec_id", "embedding", query, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("blocked near-dup pairs are a subset of the exact all-pairs ranking") {
    val blocked = DedupQueries.q32BlockedNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactAll = DedupQueries.q31EmbedNeardup(spark, dir) // top-20 exact
    // every blocked pair's sim must equal the exact sim for that pair
    val exact = embeddings.as("a")
      .join(embeddings.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("da"), col("b.vec_id").as("db"),
        round(gf.cosine_sim(col("a.embedding"), col("b.embedding")), 4).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val blockedRows = DedupQueries.q32BlockedNeardup(spark, dir).collect()
    blockedRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact(key) == r.getDouble(2), s"sim mismatch for $key")
    }
    assert(blocked.nonEmpty)
    assert(exactAll.count() == 20)
  }

  test("nprobe search always finds the query's own vector and beats random recall") {
    // 500 near-uniform 64-dim vectors in 5 lists is a worst case for IVF
    // recall, so the hard guarantees tested are: (1) the probed set always
    // contains the query's own row (its list is ranked first), (2) probing
    // 2/5 lists returns strictly better-than-random overlap with the exact
    // top-10 (random would give E[hit] = 4).
    val query = embeddings.filter(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).toArray
    val (indexed, model) = IvfIndex.build(embeddings, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    val ivf = IvfIndex.search(indexed, model, "vec_id", "embedding", query,
      k = 10, nprobe = 2).collect().map(_.getLong(0)).toSet
    assert(ivf.contains(3L), s"self-hit missing from $ivf")
    val brute = embeddings
      .select(col("vec_id"), gf.cosine_sim(col("embedding"), lit(query).cast("array<float>")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    assert((ivf intersect brute).size >= 4, s"recall ${(ivf intersect brute).size}/10")
  }

  test("calibrateNprobe returns the MINIMAL nprobe meeting the recall target") {
    val (indexed, model) = IvfIndex.build(embeddings, "embedding",
      IvfIndex.Params(listSize = 100, sampleSize = 1000))
    val idx = indexed.persist()
    idx.count()
    val queries = embeddings.filter(col("vec_id") < 6)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray).toSeq
    val nC = model.centroids.length
    assert(nC >= 3, s"need several lists, got $nC")
    // independent full curve via the public search API
    def recallAt(np: Int): Double = {
      val r = queries.map { q =>
        val t = IvfIndex.search(idx, model, "vec_id", "embedding", q, 10, nC)
          .collect().map(_.getLong(0)).toSet
        val g = IvfIndex.search(idx, model, "vec_id", "embedding", q, 10, np)
          .collect().map(_.getLong(0)).toSet
        (g & t).size.toDouble / t.size
      }
      r.sum / r.length
    }
    val curve = (1 to nC).map(np => np -> recallAt(np)).toMap
    // monotone (the property the binary search relies on)
    (1 until nC).foreach(np =>
      assert(curve(np) <= curve(np + 1) + 1e-12, s"recall not monotone at $np"))
    assert(curve(nC) == 1.0)
    for (target <- Seq(0.5, 0.9, 1.0)) {
      val (np, measured) = IvfIndex.calibrateNprobe(
        idx, model, "vec_id", "embedding", queries, 10, target)
      assert(curve(np) >= target, s"chosen np=$np misses target $target")
      if (np > 1)
        assert(curve(np - 1) < target, s"np=$np not minimal for $target")
      measured.foreach { case (p, r) =>
        assert(math.abs(r - curve(p)) < 1e-12, s"measured point $p disagrees")
      }
    }
    idx.unpersist()
  }
}
