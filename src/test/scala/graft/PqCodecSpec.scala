package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{gf, VectorKernels}
import graft.index.PqCodec

/** Product quantization: codec determinism, ADC exactness, recall of
  * the two-stage search, and the code-column-only shortlist plan. */
class PqCodecSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._
  private val dir = SparkSuite.sf0001

  private lazy val vecs: Array[(Long, Array[Float])] =
    Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

  private lazy val model =
    PqCodec.train(vecs.sortBy(_._1).take(1024).map(_._2), m = 8)

  test("training is deterministic and codes are m bytes (32x compression)") {
    val again = PqCodec.train(vecs.sortBy(_._1).take(1024).map(_._2), m = 8)
    assert(model.codebooks.length == again.codebooks.length)
    model.codebooks.zip(again.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
    val code = model.encode(VectorKernels.l2Normalize(vecs.head._2))
    assert(code.length == 8, "dim 64 / m 8 -> 8-byte codes vs 256-byte float32")
  }

  test("ADC equals the dot product against the decoded vector, bitwise") {
    val q = vecs.head._2
    val lut = model.lut(q)
    val qn = VectorKernels.l2Normalize(q)
    vecs.take(50).foreach { case (_, v) =>
      val code = model.encode(VectorKernels.l2Normalize(v))
      val adc = graft.index.PqAdcDot.adc(code, lut)
      // same per-subspace partials, same order -> exact double equality
      val dec = model.decode(code)
      val want = (0 until model.m).map { s =>
        var d = 0.0
        (0 until model.dsub).foreach { t =>
          d += qn(s * model.dsub + t).toDouble * dec(s * model.dsub + t)
        }
        d
      }.sum
      assert(adc == want, s"adc $adc != decoded dot $want")
    }
  }

  test("pq_encode expression matches the driver codec and handles null") {
    val got = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), PqCodec.pq_encode(col("embedding"), model).as("c"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    vecs.take(100).foreach { case (id, v) =>
      assert(java.util.Arrays.equals(got(id),
        model.encode(VectorKernels.l2Normalize(v))))
    }
    val nulls = Seq((1L, null: Array[Float])).toDF("vec_id", "embedding")
      .select(PqCodec.pq_encode(col("embedding"), model)).head()
    assert(nulls.isNullAt(0))
  }

  test("two-stage ADC search reaches high recall vs brute-force cosine") {
    val queries = vecs.sortBy(_._1).take(8)
    val encoded = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        PqCodec.pq_encode(col("embedding"), model).as("pqcode"))
      .cache()
    try {
      val recalls = queries.map { case (_, q) =>
        val qn = VectorKernels.l2Normalize(q)
        val exact = vecs
          .map { case (id, v) => (id, VectorKernels.dotUnit(qn, VectorKernels.l2Normalize(v))) }
          .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
        val got = PqCodec.searchAdc(encoded, "vec_id", "pqcode", "embedding",
            model, q, k = 10, rerank = 4)
          .select("vec_id").as[Long].collect().toSet
        exact.intersect(got).size / 10.0
      }
      val mean = recalls.sum / recalls.length.toDouble
      assert(mean >= 0.8, s"mean recall@10 $mean (per-query: ${recalls.toSeq})")
    } finally encoded.unpersist()
  }

  test("the ADC shortlist plan reads codes only and keeps TakeOrdered") {
    val enc = java.nio.file.Files.createTempDirectory("pqidx").toString
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        PqCodec.pq_encode(col("embedding"), model).as("pqcode"))
      .write.mode("overwrite").parquet(enc)
    val stored = spark.read.parquet(enc)
    val q = vecs.head._2
    val shortlist = stored
      .select(col("vec_id"), PqCodec.adc_dot(col("pqcode"), model.lut(q)).as("_adc"))
      .orderBy(col("_adc").desc, col("vec_id").asc)
      .limit(40)
    val plan = shortlist.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no partial top-k:\n$plan")
    val schemaLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("pqcode") && !schemaLine.contains("embedding"),
      s"shortlist must scan codes only: $schemaLine")
  }

  test("IVF-PQ equals plain ADC at nprobe=all and tracks IVF-Flat when pruned") {
    import graft.index.IvfIndex
    val e = Tables.load(spark, dir, "embeddings")
    val (indexed, ivf) = IvfIndex.build(e, "embedding",
      IvfIndex.Params(listSize = 100))
    val withCodes = indexed.select(col("vec_id"), col("embedding"),
      col("centroid_id"), PqCodec.pq_encode(col("embedding"), model).as("pqcode"))
      .cache()
    try {
      val q = vecs.head._2
      val all = PqCodec.searchIvfAdc(withCodes, ivf, "vec_id", "pqcode",
        "embedding", model, q, k = 10, nprobe = 0)
        .collect().map(_.toSeq).toSeq
      val plain = PqCodec.searchAdc(withCodes, "vec_id", "pqcode",
        "embedding", model, q, k = 10)
        .collect().map(_.toSeq).toSeq
      assert(all == plain, "nprobe=all must degenerate to the full ADC search")
      // pruned: exact-within-lists IVF-Flat is the yardstick; the PQ
      // shortlist may miss codes only past the rerank horizon
      val flat = IvfIndex.search(indexed, ivf, "vec_id", "embedding",
        q, k = 10, nprobe = 2).select("vec_id").as[Long].collect().toSet
      val pq = PqCodec.searchIvfAdc(withCodes, ivf, "vec_id", "pqcode",
        "embedding", model, q, k = 10, nprobe = 2)
        .select("vec_id").as[Long].collect().toSet
      assert(flat.intersect(pq).size >= 8,
        s"IVF-PQ strayed from IVF-Flat: ${flat -- pq} missing")
    } finally withCodes.unpersist()
  }

  test("q89 returns the true nearest neighbor first") {
    val rows = SparkEntry.queries("q89_ann_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 10)
    // exact rerank means the self-match tops the list at sim 1.0
    assert(rows.head == ((0L, 1.0)), s"head was ${rows.head}")
  }
}
