package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.index.IvfIndex

/** Scale probe: synthesizes an N-vector corpus (noop embeddings — no
  * testdata dependency) and measures the index lifecycle at the
  * REFERENCE'S production constants (listSize=10k, sample=50k) rather
  * than the test-SF-shrunk ones: build, brute-force top-k, nprobe
  * search + recall. Prints one JSON line.
  *
  * Usage: runMain graft.ScaleProbe [nRows] [dim]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_STORE: mem (default) — corpus/index cached
    // MEMORY_AND_DISK; disk — corpus/index live ONLY as parquet on disk
    // and every pass re-scans them (the out-of-memory corpus shape: at
    // 100 TB nothing fits the cache, so the disk numbers are the honest
    // ones).
    val diskOnly = sys.env.getOrElse("SPARK_GRAFT_STORE", "mem") == "disk"
    // SPARK_GRAFT_CORPUS: uniform (default) — every vector an independent
    // hash direction, the adversarial NO-structure corpus (recall at
    // small nprobe is bounded by chance overlap: the honest worst case);
    // clustered — vectors sit in tight planted clusters (center +
    // 0.15·member noise), the shape real embedding corpora have and the
    // regime IVF prunes FOR: whole clusters land in one list, so a small
    // nprobe reaches target recall.
    val corpusShape = sys.env.getOrElse("SPARK_GRAFT_CORPUS", "uniform")
    val nClusters = math.max(8, n / 1000)
    val gen = (corpusShape match {
      case "clustered" =>
        spark.range(n.toLong)
          .withColumn("c", gf.dequantize_vec(gf.noop_embed(
            concat(lit("center:"), (col("id") % nClusters).cast("string")), dim)))
          .withColumn("e", gf.dequantize_vec(
            gf.noop_embed(col("id").cast("string"), dim)))
          .select(col("id").as("vec_id"),
            expr("transform(zip_with(c, e, (a, b) -> a + 0.15d * b), " +
              "x -> cast(x as float))").as("embedding"))
      case _ =>
        spark.range(n.toLong)
          .select(col("id").as("vec_id"),
            gf.dequantize_vec(gf.noop_embed(col("id").cast("string"), dim))
              .as("embedding"))
    }).repartition(cpus.toInt)
    val corpus = if (diskOnly) {
      val dir = java.nio.file.Files.createTempDirectory("probe_corpus").toString
      gen.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    } else {
      val c = gen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }

    var t0 = System.nanoTime()
    // SPARK_GRAFT_BUILD: flat (default) | dnc | mllib
    val (indexed, model) = sys.env.getOrElse("SPARK_GRAFT_BUILD", "flat") match {
      case "dnc" => IvfIndex.buildDnc(corpus, "embedding")
      case "mllib" => IvfIndex.buildMllib(corpus, "embedding")
      case _ => IvfIndex.build(corpus, "embedding") // 10k lists, 50k sample
    }
    val idx = if (diskOnly) {
      // partition by list so the nprobe filter prunes directories — the
      // on-disk analogue of the cached filter scan
      val dir = java.nio.file.Files.createTempDirectory("probe_assigned").toString
      indexed.write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
      spark.read.parquet(dir)
    } else {
      val i = indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      i.count()
      i
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = corpus.filter(col("vec_id") < 8)
      .collect().map(r => r.getSeq[Float](1).toArray)

    def brute(q: Array[Float]): Set[Long] =
      corpus.select(col("vec_id"),
          gf.cosine_sim(col("embedding"), lit(q).cast("array<float>")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
    t0 = System.nanoTime()
    val exact = queries.map(brute)
    val bruteMs = (System.nanoTime() - t0) / 1e6 / queries.length

    def ivf(nprobe: Int): (Double, Double) = {
      val t = System.nanoTime()
      val rec = queries.zipWithIndex.map { case (q, i) =>
        val got = IvfIndex.search(idx, model, "vec_id", "embedding", q, 10, nprobe)
          .collect().map(_.getLong(0)).toSet
        (got intersect exact(i)).size / 10.0
      }
      ((System.nanoTime() - t) / 1e6 / queries.length, rec.sum / rec.length)
    }
    val (ms1, r1) = ivf(1)
    val (ms4, r4) = ivf(4)

    // clustered corpora are WHY IVF works: calibrateNprobe must land a
    // small nprobe at recall@10 >= 0.9 where cluster structure exists
    // (on the uniform corpus the same curve is the documented worst
    // case — every list holds a chance-slice of any query's true top-k)
    val (npCal, calPoints) =
      if (corpusShape == "clustered")
        IvfIndex.calibrateNprobe(idx, model, "vec_id", "embedding",
          queries.toSeq, 10, targetRecall = 0.9)
      else (0, Map.empty[Int, Double])
    if (corpusShape == "clustered") {
      assert(npCal <= math.max(1, model.k / 5),
        s"clustered corpus should reach 0.9 recall probing <=1/5 of " +
          s"${model.k} lists, needed $npCal")
      System.err.println(s"[probe] clustered calibration: nprobe=$npCal " +
        s"recall points=${calPoints.toSeq.sorted.mkString(",")}")
    }

    // on-disk quantized layout: partition pruning means an nprobe=1 query
    // reads ~1/lists of the bytes a full-scan read does
    val qDir = java.nio.file.Files.createTempDirectory("probe_idx").toString
    t0 = System.nanoTime()
    IvfIndex.writeQuantized(idx.select("vec_id", "embedding", "centroid_id"),
      "embedding", qDir)
    val writeSec = (System.nanoTime() - t0) / 1e9
    val onDisk = spark.read.parquet(qDir)
    def diskIvf(nprobe: Int): Double = {
      val t = System.nanoTime()
      queries.foreach { q =>
        IvfIndex.searchQuantized(onDisk, model, "vec_id", "qvec", q, 10, nprobe)
          .collect()
      }
      (System.nanoTime() - t) / 1e6 / queries.length
    }
    val dms1 = diskIvf(1)
    t0 = System.nanoTime()
    queries.foreach { q =>
      IvfIndex.searchQuantized(onDisk, model, "vec_id", "qvec", q, 10, -1).collect()
    }
    val dmsAll = (System.nanoTime() - t0) / 1e6 / queries.length

    // the DSv2 fixed-width binary connector over the same index: list
    // pruning happens at the connector (non-probed dirs never planned)
    // instead of via parquet partition discovery
    val bDir = java.nio.file.Files.createTempDirectory("probe_bin").toString
    t0 = System.nanoTime()
    graft.sources.IvfBinarySource.write(
      idx.select("vec_id", "embedding", "centroid_id"), "vec_id", "embedding", bDir)
    val bWriteSec = (System.nanoTime() - t0) / 1e9
    def binIvf(nprobe: Int): Double = {
      val t = System.nanoTime()
      queries.foreach { q =>
        graft.sources.IvfBinarySource.search(spark, bDir, model, q, 10, nprobe)
          .collect()
      }
      (System.nanoTime() - t) / 1e6 / queries.length
    }
    // load once, like the parquet side's reused onDisk frame — per-query
    // relation rebuild is overhead in both layouts
    val binIdx = spark.read.format(graft.sources.IvfBinarySource.FORMAT).load(bDir)
    def binIvfReused(nprobe: Int): Double = {
      val t = System.nanoTime()
      queries.foreach { q =>
        graft.sources.IvfBinarySource.search(binIdx, model, q, 10, nprobe).collect()
      }
      (System.nanoTime() - t) / 1e6 / queries.length
    }
    val bms1 = binIvfReused(1)
    val bmsAll = binIvf(-1)

    // per-list stats: COUNT(*) GROUP BY centroid_id is answered from file
    // sizes at plan time (DSv2 complete aggregate pushdown); count(vec_id)
    // cannot push and iterates every row — the gap grows with corpus size
    def timed2(f: => Unit): Double = { // warm plan once, time the rerun
      f
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6
    }
    val cntPushMs = timed2(binIdx.groupBy("centroid_id").count().collect())
    val cntRowsMs = timed2(
      binIdx.groupBy("centroid_id").agg(count(col("vec_id"))).collect())

    val calJson =
      if (corpusShape == "clustered")
        s""","nprobe_cal":$npCal,"cal_recall":${calPoints.getOrElse(npCal, 1.0)}"""
      else ""
    println(s"""{"probe":"scale","n":$n,"dim":$dim,"corpus":"$corpusShape"$calJson,"store":"${if (diskOnly) "disk" else "mem"}","lists":${model.k},""" +
      s""""build_sec":$buildSec,"brute_ms":$bruteMs,""" +
      s""""nprobe1_ms":$ms1,"nprobe1_recall":$r1,"nprobe4_ms":$ms4,"nprobe4_recall":$r4,""" +
      s""""qindex_write_sec":$writeSec,"disk_nprobe1_ms":$dms1,"disk_scanall_ms":$dmsAll,""" +
      s""""bin_write_sec":$bWriteSec,"bin_nprobe1_ms":$bms1,"bin_scanall_ms":$bmsAll,""" +
      s""""bin_count_push_ms":$cntPushMs,"bin_count_rows_ms":$cntRowsMs}""")
    spark.stop()
  }
}
