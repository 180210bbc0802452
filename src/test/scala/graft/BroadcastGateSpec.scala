package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The last corpus-derived (open-vocabulary) dimension tables that used
  * to ride unconditional `broadcast()` hints: q57's term-df table,
  * q60's unigram table (joined twice), q107's dup-cluster labels. A
  * crawl-scale distinct-token table runs to billions of rows — the
  * hint bypasses autoBroadcastJoinThreshold and OOMs the driver — so
  * all three now go through DedupOps' size gates. This spec flips each
  * gate and pins, PER JOIN KEY (the queries contain other joins):
  * broadcast when small, sort-merge when large, rows identical. */
class BroadcastGateSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf0001

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Join strategies in the static plan keyed (either side) on `key` —
    * the key names are chosen unique to the gated join so sibling
    * joins inside the same query can't mask a regression. */
  private def strategiesOn(df: org.apache.spark.sql.DataFrame,
      key: String): Seq[String] = {
    def hits(ks: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      ks.exists(_.references.exists(_.name == key))
    df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec
        if hits(j.leftKeys) || hits(j.rightKeys) => "bhj"
      case j: SortMergeJoinExec
        if hits(j.leftKeys) || hits(j.rightKeys) => "smj"
    }
  }

  private def pin(small: org.apache.spark.sql.DataFrame,
      large: org.apache.spark.sql.DataFrame, keys: Seq[String]): Unit = {
    keys.foreach { k =>
      assert(strategiesOn(small, k).contains("bhj"),
        s"$k not broadcast in the small regime")
      val l = strategiesOn(large, k)
      assert(l.nonEmpty && l.forall(_ == "smj"),
        s"$k not demoted to sort-merge in the large regime: $l")
    }
    assert(rowsOf(small) == rowsOf(large))
  }

  test("q57 df join: broadcast small, sort-merge large, row-identical") {
    pin(CurationQueries.q57TfidfTopterms(spark, dir, Long.MaxValue),
      CurationQueries.q57TfidfTopterms(spark, dir, 0L), Seq("tok"))
  }

  test("q60 unigram joins: broadcast small, sort-merge large, row-identical") {
    pin(CurationQueries.q60BigramPmi(spark, dir, Long.MaxValue),
      CurationQueries.q60BigramPmi(spark, dir, 0L), Seq("x", "y"))
  }

  test("q107 label join: broadcast small, sort-merge large, row-identical") {
    pin(CurationQueries.q107LeakageSafeSplit(spark, dir, Long.MaxValue),
      CurationQueries.q107LeakageSafeSplit(spark, dir, 0L), Seq("node"))
  }

  // the decontamination seam was the LAST family broadcasting a
  // caller-supplied open-ended input unconditionally (r10 verdict #1):
  // the composed export/streaming paths take the union of ALL eval
  // suites as `bench`, and a HELM-scale union outgrows any broadcast
  // budget. Both suite-side joins now ride gateKnown on the prepared
  // suite's shingle count.

  private def deconFixture = {
    import spark.implicits._
    val bench = Seq((9000L, "qq1 qq2 qq3 qq4 qq5 qq6 qq7"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "qq1 qq2 qq3 qq4 qq5 qq6 qq7 pad1 pad2 pad3"),
      (101L, "qq1 qq2 qq3 qq4 u1 u2 u3 u4 u5 u6 u7 u8 u9"),
      (102L, (1 to 15).map(j => s"cl$j").mkString(" ")))
      .toDF("doc_id", "text")
    (corpus, bench)
  }

  test("benchContainment suite joins: broadcast small, sort-merge large, row-identical") {
    val (corpus, bench) = deconFixture
    pin(DedupQueries.benchContainment(corpus, bench, Long.MaxValue),
      DedupQueries.benchContainment(corpus, bench, 0L),
      Seq("s", "bench_doc"))
  }

  test("decontaminateRewrite chunk-set join: broadcast small, sort-merge large, row-identical") {
    import spark.implicits._
    val bench = Seq((9000L, (1 to 8).map(j => s"bb$j").mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (200L, ((1 to 8).map(j => s"bb$j") ++
        (1 to 8).map(j => s"keep$j")).mkString(" ")),
      (201L, (1 to 12).map(j => s"cl$j").mkString(" ")))
      .toDF("doc_id", "text")
    // the full op PINS the detect stage (localCheckpoint), so the gated
    // `c`-keyed join executes during DataFrame construction and is
    // structurally ABSENT from the result's plan — the regime flip is
    // asserted on the exposed PRE-PIN detect seam (rewriteDetect),
    // which is the exact frame the op pins (r11 asserted it on the
    // post-pin plan, which can never contain the join)
    val prep = AnalyticsQueries.prepareRewriteBench(bench)
    pin(AnalyticsQueries.rewriteDetect(corpus, prep, Long.MaxValue),
      AnalyticsQueries.rewriteDetect(corpus, prep, 0L), Seq("c"))
    // and the FINAL plan's verdict join-back is itself size-gated on
    // the pinned table's count: broadcast in the small regime (the
    // AQE-one-task reassembly fix), demoted to sort-merge in the large
    val small = AnalyticsQueries.decontaminateRewrite(corpus, prep,
      Long.MaxValue)
    val large = AnalyticsQueries.decontaminateRewrite(corpus, prep, 0L)
    assert(strategiesOn(small, "_rdid").contains("bhj"),
      "_rdid join-back not broadcast in the small regime")
    val l = strategiesOn(large, "_rdid")
    assert(l.nonEmpty && l.forall(_ == "smj"),
      s"_rdid join-back not demoted to sort-merge in the large regime: $l")
    assert(rowsOf(small) == rowsOf(large))
  }
}
