package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TrainingExport

class TrainingExportSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf0001

  private def docs = Tables.load(spark, dir, "documents")
    .select("doc_id", "text", "lang")

  private def tmp(): String =
    Files.createTempDirectory("graft-export").toString

  test("export is deterministic: same seed, same manifest, re-run identical") {
    val (d1, d2) = (tmp(), tmp())
    val m1 = TrainingExport.exportShards(docs, d1, 8, seed = 7L)
    val m2 = TrainingExport.exportShards(docs, d2, 8, seed = 7L)
    assert(m1 == m2, "two runs with one seed must produce one manifest")
    assert(m1.map(_.rows).sum == docs.count())
    assert(TrainingExport.readManifest(spark, d1) == m1)
  }

  test("every doc lands in exactly one shard; token counts conserve") {
    val d = tmp()
    val m = TrainingExport.exportShards(docs, d, 8, seed = 7L)
    val back = spark.read.parquet(d)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    val totalToks = docs
      .select(sum(graft.functions.gf.token_count(col("text")).cast("long")))
      .first().getLong(0)
    assert(m.map(_.tokens).sum == totalToks)
  }

  test("a new seed is a new epoch: membership reshuffles deterministically") {
    val (d1, d2) = (tmp(), tmp())
    val m1 = TrainingExport.exportShards(docs, d1, 8, seed = 1L)
    val m2 = TrainingExport.exportShards(docs, d2, 8, seed = 2L)
    assert(m1 != m2, "different seeds must reshuffle shard membership")
    assert(m1.map(_.rows).sum == m2.map(_.rows).sum)
  }

  test("each shard is one file, readable standalone, ordered by _ord") {
    val d = tmp()
    TrainingExport.exportShards(docs, d, 4, seed = 3L)
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$d/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s should be exactly one file")
      val rows = spark.read.parquet(files.head.getPath)
        .orderBy("_ord").select("doc_id").collect().map(_.getLong(0)).toSeq
      // the epoch order is a pure function of (seed, doc_id): recompute
      val expected = docs.select(col("doc_id"),
          md5(concat_ws(":", lit(3L), col("doc_id")).cast("binary")).as("o"),
          pmod(xxhash64(lit(3L), col("doc_id")), lit(4)).cast("int").as("sh"))
        .filter(col("sh") === s).orderBy("o")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == expected, s"shard $s order must be the epoch order")
    }
  }

  test("append(A); append(B) produces the manifest of export(A ∪ B)") {
    val (dInc, dOne) = (tmp(), tmp())
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    TrainingExport.appendShards(a, dInc, 8, seed = 11L)
    val incremental = TrainingExport.appendShards(b, dInc, 8, seed = 11L)
    val oneShot = TrainingExport.exportShards(docs, dOne, 8, seed = 11L)
    assert(incremental == oneShot,
      "incremental manifest must equal the one-shot export manifest")
    // the accumulated directory certifies against the merged manifest
    assert(TrainingExport.verifyShards(spark, dInc).isEmpty)
    // and a shard read ORDER BY _ord still reconstructs the epoch
    // order across the append-created files
    val sh = oneShot.filter(_.rows > 0).head.shard
    val got = spark.read.parquet(s"$dInc/shard=$sh").orderBy("_ord")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val want = spark.read.parquet(s"$dOne/shard=$sh").orderBy("_ord")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("manifests record their digest keying; appending into a mixture export fails fast") {
    val (dPlain, dMixed) = (tmp(), tmp())
    TrainingExport.exportShards(docs, dPlain, 4, seed = 5L)
    assert(TrainingExport.manifestKeyedOnCopy(spark, dPlain).contains(false))
    val rates = CurationQueries.mixtureRates(spark, dir)
    TrainingExport.exportMixedShards(docsSrc, rates, dMixed, 4, seed = 5L)
    assert(TrainingExport.manifestKeyedOnCopy(spark, dMixed).contains(true))
    // a copy-less append would merge digests of two different hash
    // keyings into one manifest — refused up front
    intercept[IllegalStateException] {
      TrainingExport.appendShards(docs, dMixed, 4, seed = 5L)
    }
    // the refused append must not have touched the directory
    assert(TrainingExport.verifyShards(spark, dMixed).isEmpty)
    // LEGACY manifest (written before the keying field existed): the
    // check must fall back to the file schema like verifyShards does —
    // the files carry `copy`, so the append is still refused
    val p = new org.apache.hadoop.fs.Path(dMixed, "_manifest.json")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = {
      val in = hfs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val legacy = body.replace(""""digest_keyed_on_copy":true,""", "")
    val out = hfs.create(p, true)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()
    assert(TrainingExport.manifestKeyedOnCopy(spark, dMixed).isEmpty)
    intercept[IllegalStateException] {
      TrainingExport.appendShards(docs, dMixed, 4, seed = 5L)
    }
    assert(TrainingExport.verifyShards(spark, dMixed).isEmpty)
  }

  test("streaming export: two micro-batches drain into certified shards") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val d = tmp()
    val ckpt = tmp()
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (first, rest) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)](spark)
    mem.addData(first: _*)
    mem.addData(rest: _*)
    graft.streaming.Streams.runExportAppend(
      mem.toDF.toDF("doc_id", "text"), d, 4, seed = 13L, ckpt)
    assert(TrainingExport.verifyShards(spark, d).isEmpty)
    val manifest = TrainingExport.readManifest(spark, d)
    assert(manifest.map(_.rows).sum == rows.length)
    // manifest equals a one-shot batch export of the same rows
    val dBatch = tmp()
    val batch = TrainingExport.exportShards(
      docs.select("doc_id", "text"), dBatch, 4, seed = 13L)
    assert(manifest == batch)
  }

  private def docsSrc = Tables.load(spark, dir, "documents")
    .select("doc_id", "text", "lang", "source")

  test("mixed export realizes exactly q111's multiplicities, certified") {
    val d = tmp()
    val rates = CurationQueries.mixtureRates(spark, dir)
    val m = TrainingExport.exportMixedShards(docsSrc, rates, d, 8, seed = 3L)
    val want = CurationQueries.q111MixtureApply(spark, dir)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val written = spark.read.parquet(d)
    val got = written.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "export multiplicities must equal the q111 plan")
    assert(m.map(_.rows).sum == want.values.sum)
    assert(TrainingExport.verifyShards(spark, d).isEmpty)
    // copies are independent samples: every copy of a doc gets its own
    // deterministic order key, so they scatter instead of clumping
    val ords = written.select("doc_id", "_ord").collect()
      .groupBy(_.getLong(0)).values
    assert(ords.forall(g => g.map(_.getString(1)).distinct.length == g.length))
  }

  test("identical-text copies cannot cancel out of the mixed digest") {
    val d = tmp()
    // force exactly 2 copies of every doc: identical text, copy 1 and 2
    val rates = docsSrc.select("source").distinct()
      .selectExpr("source", "CAST(2 AS BIGINT) AS base",
        "CAST(0 AS BIGINT) AS rem", "CAST(1 AS BIGINT) AS den")
    TrainingExport.exportMixedShards(docsSrc, rates, d, 4, seed = 11L)
    assert(TrainingExport.verifyShards(spark, d).isEmpty)
    // substitution tamper that a copy-free digest cannot see: replace a
    // doc's copy=2 row with a second copy=1 row — same doc_id, same
    // text, same row count, same tokens; only the copy value changed
    val rows = spark.read.parquet(d)
    val target = rows.filter(col("copy") === 2L).select("doc_id", "shard").head()
    val (tDoc, tShard) = (target.getLong(0), target.getInt(1))
    val shardRows = spark.read.parquet(s"$d/shard=$tShard").collect()
    val schema = spark.read.parquet(s"$d/shard=$tShard").schema
    val copyIdx = schema.fieldIndex("copy")
    val docIdx = schema.fieldIndex("doc_id")
    val forged = shardRows.map { r =>
      if (r.getLong(docIdx) == tDoc && r.getLong(copyIdx) == 2L)
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq.updated(copyIdx, 1L))
      else r
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(forged.toSeq), schema)
      .write.mode("overwrite").parquet(s"$d/shard=$tShard")
    assert(TrainingExport.verifyShards(spark, d) == Seq(tShard))
  }

  test("exportCurated: one call from raw corpus to certified shards") {
    val d = tmp()
    val m = CurationRun.exportCurated(spark, dir, d, 8, seed = 9L)
    assert(TrainingExport.verifyShards(spark, d).isEmpty)
    val written = spark.read.parquet(d)
    // no verdict-dropped doc reaches the shards, and the verdict bites
    val keepSet = DedupQueries.q124DedupVerdict(spark, dir)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    val shardDocs = written.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(shardDocs.subsetOf(keepSet))
    assert(keepSet.size < Tables.load(spark, dir, "documents").count(),
      "the verdict must actually remove something on this fixture")
    // multiplicities equal the survivor-planned mixture, not the raw
    // one — including the docs the mixture legitimately downsamples
    // away (n_copies = 0 for over-represented sources)
    val survivors = CurationRun.curatedSurvivors(spark, dir)
    val want = CurationQueries.applyMixture(survivors,
        CurationQueries.mixtureRatesOf(survivors))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = written.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(shardDocs == want.keySet)
    assert(m.map(_.rows).sum == want.values.sum)
  }

  test("verifyShards certifies intact output and pinpoints a tampered shard") {
    val d = tmp()
    TrainingExport.exportShards(docs, d, 4, seed = 5L)
    assert(TrainingExport.verifyShards(spark, d).isEmpty)
    // tamper: append a forged row into shard 2's directory
    val forged = spark.range(1).select(
      lit(999999L).as("doc_id"), lit("forged row").as("text"),
      lit("xx").as("lang"), lit("deadbeef").as("_ord"), lit(2L).as("tokens"))
    forged.write.mode("append").parquet(s"$d/shard=2")
    assert(TrainingExport.verifyShards(spark, d) == Seq(2))
  }
}
