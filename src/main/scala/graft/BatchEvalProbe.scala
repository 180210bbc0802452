package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batched-vs-looped eval probe: wall-clocks [[graft.index.IvfIndex
  * .searchBatch]] (one probe-join job for the whole query set — the
  * shape q98/q99/maxsimIvf eval now ride) against the per-query
  * [[graft.index.IvfIndex.search]] loop it replaced, on an N-vector
  * on-disk corpus. A single-query Spark job pays a fixed planning +
  * scheduling floor regardless of data size; the probe shows eval
  * wall-clock is SUBLINEAR in query count — batch-256 ≪ 256 × single —
  * while asserting the batch returns the loop's exact top-k per query.
  *
  * Usage: runMain graft.BatchEvalProbe [nVectors] [nQueries]
  */
object BatchEvalProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val nq = if (args.length > 1) args(1).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.index.IvfIndex

    // hash-mixed pseudo-random vectors: dense, deterministic, cheap
    val dir = java.nio.file.Files.createTempDirectory("batcheval_probe").toString
    spark.range(n)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
                 CAST(pmod(hash(id, i), 1000) / 1000.0 - 0.5 AS FLOAT))""")
          .as("embedding"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/vectors.parquet")

    val vecs = spark.read.parquet(s"$dir/vectors.parquet")
    var t0 = System.nanoTime()
    val (idx, model) = IvfIndex.build(vecs, "embedding",
      IvfIndex.Params(listSize = 10000, sampleSize = 50000))
    val cached = idx.persist()
    cached.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = vecs.filter(col("vec_id") < nq)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val (k, nprobe) = (10, 4)

    // the loop form's per-query cost: average over a bounded sample
    // (timing all nq single-query jobs would just burn probe minutes)
    val sample = queries.take(8)
    t0 = System.nanoTime()
    val loopTop = sample.map { case (qid, qv) =>
      qid -> IvfIndex.search(cached, model, "vec_id", "embedding", qv, k, nprobe)
        .collect().map(_.getLong(0)).toSeq
    }.toMap
    val perQuerySec = (System.nanoTime() - t0) / 1e9 / sample.size

    t0 = System.nanoTime()
    val batch = IvfIndex
      .searchBatch(cached, model, "vec_id", "embedding", queries, k, nprobe)
      .collect()
    val batchSec = (System.nanoTime() - t0) / 1e9

    val batchTop = batch.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    require(batchTop.size == nq, s"batch answered ${batchTop.size} of $nq")
    loopTop.foreach { case (qid, want) =>
      require(batchTop(qid) == want,
        s"query $qid: batch ${batchTop(qid)} != loop $want")
    }

    val speedup = perQuerySec * nq / batchSec
    println(f"""{"probe":"batch_eval","n":$n,"n_queries":$nq,""" +
      f""""build_sec":$buildSec%.1f,"single_query_sec":$perQuerySec%.3f,""" +
      f""""batch_sec":$batchSec%.1f,"speedup_vs_loop":$speedup%.1f}""")
    spark.stop()
  }
}
