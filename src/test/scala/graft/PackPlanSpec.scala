package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q132's packing must never compute its per-language token offsets
  * through a `Window.partitionBy(lang)` running sum: a mega-language
  * (60%-English crawls are the norm) would funnel its whole corpus
  * through ONE task's sort. The production path is RankOps
  * .runningSumPer's range-exchange prefix sum; this spec pins the plan
  * shape (no lang-partitioned window ordered over the corpus; the
  * local accumulation windows on (_pid, lang)) and proves row identity
  * against BOTH the banned window form and a driver-side brute force
  * on a skewed-language fixture with split-inducing doc lengths. */
class PackPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // 9:1 skewed langs, token counts 0..13 around the seqLen=7 boundary
  // (empties, whitespace-only, one-token, exact-boundary, splitters)
  private def fixture = {
    import spark.implicits._
    (1 to 240).map { i =>
      val lang = if (i % 10 == 0) "de" else "en"
      val n = i % 14
      val text =
        if (n == 0) { if (i % 3 == 0) "" else "   " }
        else (1 to n).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text").repartition(7)
  }

  test("packSequences plan has no corpus-sized lang window") {
    val plan = CurationQueries.packSequences(fixture, 7L)
    val wins = plan.queryExecution.sparkPlan.collect {
      case w: WindowExec =>
        (w.partitionSpec.map(_.sql.replaceAll("`", "")),
         w.orderSpec.map(_.child.sql.replaceAll("`", "")))
    }
    wins.foreach { case (parts, order) =>
      assert(parts.contains("_pid") || order.forall(_ == "_pid"),
        s"corpus-sized window crept back: partitionBy=$parts orderBy=$order")
      assert(!order.contains("doc_id"),
        s"the banned lang-window running sum is back: orderBy=$order")
    }
    // the local accumulation is present and keyed by the physical
    // partition, so its groups are partition-sized by construction
    assert(wins.exists(_._1.contains("_pid")),
      s"expected the (_pid, lang) local prefix-sum window, saw: $wins")
  }

  test("q59PackPlan plan has no corpus-sized lang window either") {
    val plan = CurationQueries.q59PackPlan(spark, SparkSuite.sf0001)
    val wins = plan.queryExecution.sparkPlan.collect {
      case w: WindowExec =>
        (w.partitionSpec.map(_.sql.replaceAll("`", "")),
         w.orderSpec.map(_.child.sql.replaceAll("`", "")))
    }
    wins.foreach { case (parts, order) =>
      assert(parts.contains("_pid") || order.forall(_ == "_pid"),
        s"corpus-sized window crept back into q59: partitionBy=$parts orderBy=$order")
      assert(!order.contains("doc_id"),
        s"the banned lang-window running sum is back in q59: orderBy=$order")
    }
    assert(wins.exists(_._1.contains("_pid")),
      s"expected the (_pid, lang) local prefix-sum window in q59, saw: $wins")
  }

  test("packSequences rows match the windowed twin and a brute force") {
    val L = 7L
    val got = CurationQueries.packSequences(fixture, L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap

    // independent driver-side oracle: concatenate per-lang token
    // streams in doc_id order, chop at L, reassemble spans
    val docs = fixture.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val want = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      val stream = ds.flatMap { case (id, _, text) =>
        text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map(id -> _)
      }
      stream.zipWithIndex.groupBy(_._2 / L).map { case (seqId, toks) =>
        val pieces = toks.map { case ((id, w), p) => (id, p, w) }
          .groupBy(_._1).toSeq
          .map { case (id, ws) =>
            val pa = ws.map(_._2).min
            (pa, id, ws.length, ws.sortBy(_._2).map(_._3).mkString(" "))
          }.sortBy(_._1)
        (lang, seqId) -> (
          pieces.length.toLong,
          toks.length.toLong,
          pieces.map(_._4).mkString(" "),
          pieces.map { case (pa, id, len, _) =>
            s"$id:${pa - seqId * L}:$len" }.mkString(" "))
      }
    }
    assert(got == want)
    // every interior sequence is exactly L tokens
    got.groupBy(_._1._1).foreach { case (lang, seqs) =>
      val lastId = seqs.keys.map(_._2).max
      seqs.foreach { case ((_, sid), (_, n, _, _)) =>
        if (sid != lastId) assert(n == L, s"$lang/$sid has $n tokens") }
    }

    // and the banned window form computes identical offsets (the twin
    // is test-only; this guards refactors of either side)
    val prodOffsets = {
      val toks = when(length(trim(col("text"))) === 0,
          expr("cast(array() as array<string>)"))
        .otherwise(split(trim(lower(col("text"))), "\\s+"))
      val narrow = fixture.select(col("doc_id"), col("lang"), toks.as("t"))
        .select(col("doc_id"), col("lang"),
          size(col("t")).cast("long").as("n"))
        .filter(col("n") > 0)
      graft.operators.RankOps
        .runningSumPer(narrow, "lang", Seq(col("doc_id").asc), "n", "endp")
        .withColumn("startp", col("endp") - col("n"))
        .select("doc_id", "startp", "endp").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val winOffsets = CurationQueries.packSequencesWindowedOffsets(fixture)
      .select("doc_id", "startp", "endp").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prodOffsets == winOffsets)
  }
}
