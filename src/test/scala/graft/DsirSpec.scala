package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WeightedSample

/** DSIR importance weighting: q88's integer evidence (oracle-gated) and
  * the spec-gated log-likelihood-ratio scorer + resampling composition.
  */
class DsirSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._
  private val dir = SparkSuite.sf0001
  private val B = 4096

  /** Driver-side reference: doc → (lang, hashed feature buckets). */
  private lazy val docFeats: Map[Long, (String, Seq[Int])] = {
    val rows = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
    rows.map { r =>
      val toks = r.getString(2).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
      val buckets = toks.map { t =>
        val hex = md.digest(t.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        Integer.parseInt(hex.take(3), 16)
      }
      r.getLong(0) -> (r.getString(1), buckets)
    }.toMap
  }

  test("q88 evidence matches a driver-side exact recompute") {
    val tgt = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val raw = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    docFeats.values.foreach { case (lang, bs) =>
      bs.foreach { b => raw(b) += 1; if (lang == "en") tgt(b) += 1 }
    }
    val got = SparkEntry.queries("q88_dsir_evidence")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == docFeats.keySet)
    docFeats.foreach { case (id, (_, bs)) =>
      val want = (bs.size.toLong, bs.map(tgt).sum, bs.map(raw).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("dsirScore matches the smoothed log-likelihood ratio exactly") {
    val tgt = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val raw = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    docFeats.values.foreach { case (lang, bs) =>
      bs.foreach { b => raw(b) += 1; if (lang == "en") tgt(b) += 1 }
    }
    val tNorm = tgt.values.sum.toDouble + B
    val rNorm = raw.values.sum.toDouble + B
    val got = CurationQueries.dsirScore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    docFeats.foreach { case (id, (_, bs)) =>
      val want =
        if (bs.isEmpty) 0.0
        else bs.map(b => math.log(tgt(b) + 1.0) - math.log(raw(b) + 1.0)).sum +
          bs.size * math.log(rNorm / tNorm)
      assert(math.abs(got(id) - want) < 1e-6 * (1 + math.abs(want)),
        s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("target-domain docs score higher than off-target docs") {
    val byLang = CurationQueries.dsirScore(spark, dir)
      .join(Tables.load(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("dsir_score").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} must exceed off-target mean ${byLang(false)}")
  }

  test("importance resampling composes with WeightedSample and favors the target") {
    // the raw score tracks doc LENGTH (n negative per-token terms sum),
    // so the importance weight uses the per-token rate; the temperature
    // amplifies the domain contrast (Δ ≈ 0.4σ on this shared-vocab
    // synthetic corpus) into decisive odds while off-target docs keep
    // nonzero mass
    val rated = CurationQueries.dsirScore(spark, dir)
      .filter(col("n_feats") > 0)
      .withColumn("rate", col("dsir_score") / col("n_feats"))
    // center the exponent: uncentered, exp(800·(−0.19)) underflows and
    // every A-ES key collapses to 0 (w must stay in double range)
    val mid = rated.agg(avg("rate")).head().getDouble(0)
    val scored = rated
      .withColumn("w", exp((col("rate") - lit(mid)) * lit(800.0)))
      .withColumn("g", graft.functions.gf.one_partition(col("doc_id")))
    val sample = WeightedSample.exactKPerGroup(
      scored, col("g"), col("doc_id"), col("w"), k = 60, seed = 7L)
    assert(sample.count() == 60)
    val enShare = sample
      .join(Tables.load(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
      .agg(avg(when(col("lang") === "en", 1.0).otherwise(0.0)))
      .head().getDouble(0)
    val enBase = Tables.load(spark, dir, "documents")
      .agg(avg(when(col("lang") === "en", 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(enShare > enBase + 0.05,
      s"resample en share $enShare must clearly exceed corpus base rate $enBase")
  }
}
