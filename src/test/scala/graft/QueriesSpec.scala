package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.gf

/** Sanity layer on the declared query inventory at sf0.001. The real
  * correctness gate is the DuckDB oracle (tools/check_oracle.py, driver t2);
  * these specs catch regressions fast and pin non-SQL behaviors. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = SparkSuite.sf0001

  test("every registered query executes and has an oracle or a reason") {
    Queries.registry.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, name)
      df.count() // must execute
      assert(Queries.oracle.contains(name) || name.startsWith("qx"),
        s"$name lacks an oracle entry")
    }
  }

  test("the full registry runs with codegen fallback disabled") {
    // a broken doGenCode anywhere would silently degrade every run of
    // that expression to interpreted eval; with fallback off it throws
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, dir).count()
      catch { case e: Throwable => fail(s"$name failed under codegen-only: ${e.getMessage}") }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("oracle keys match registry keys") {
    assert(Queries.oracle.keySet.subsetOf(Queries.registry.keySet))
  }

  test("q16 cosine top-k is deterministic and self-match leads") {
    val rows = Queries.q16CosineTopk(spark, dir).collect()
    assert(rows.length == 10)
    // vec_id=0 vs itself has sim 1.0 and must rank first
    assert(rows.head.getLong(0) == 0L && rows.head.getDouble(1) == 1.0)
    val sims = rows.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("q15 vector mean matches a brute-force computation") {
    val got = Queries.q15VectorMean(spark, dir)
      .filter(col("label") === 0 && col("pos") === 0)
      .collect()(0).getDouble(2)
    val exp = {
      val vs = Tables.load(spark, dir, "embeddings")
        .filter(col("label") === 0)
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).head)
      val mean = (vs.map(_.toDouble).sum / vs.length).toFloat
      math.round(mean.toDouble * 10000) / 10000.0
    }
    assert(math.abs(got - exp) < 2e-4, s"$got vs $exp")
  }

  test("cosine_sim expression stays inside whole-stage codegen") {
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    // AQE reports 0 codegen subtrees before execution; disable it here.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val codegen =
      try e.crossJoin(broadcast(q))
        .select(gf.cosine_sim(col("embedding"), col("qvec")).as("sim"))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(codegen.contains("WholeStageCodegen"), codegen)
    // the kernel call must appear inside generated code, not a UDF fallback
    assert(codegen.contains("VectorKernels.cosineAD"), codegen)
  }

  test("filters and projections reach the parquet scan") {
    val plan = Queries.q08InlistScan(spark, SparkSuite.sf0001)
      .queryExecution.executedPlan.toString
    // predicate pushdown: the IN-list and range filter appear as
    // PushedFilters on the scan node, not only as a post-scan Filter
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("In(l_suppkey"), plan)
    assert(plan.contains("LessThan(l_shipdate"), plan)
    // column pruning: the 16-column lineitem scan reads only what q08 needs
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice", "l_shipdate")
      .forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("native expressions are callable from SQL after registerAll") {
    gf.registerAll(spark)
    Tables.registerAll(spark, dir)
    val r = spark.sql(
      """SELECT vec_id,
        |  round(cosine_sim(embedding, embedding), 4) AS self_sim,
        |  cosine_sim_q(quantize_vec(embedding), quantize_vec(embedding)) AS qq,
        |  size(dequantize_vec(quantize_vec(embedding))) AS dim
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getDouble(1) == 1.0)
      assert(row.getDouble(2) > 0.999)
      assert(row.getInt(3) == 64)
    }
  }

  test("q47 trigram LM returns empty (not NPE) when no document has 3+ chars") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q47empty").toString
    Seq((1L, "ab", "en", "web", 2L), (2L, "", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = RetrievalQueries.q47TrigramLm(spark, tmp)
    assert(out.columns.toSeq == Seq("doc_id", "avg_logp"))
    assert(out.count() == 0)
  }

  test("entry returns rows (driver t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
