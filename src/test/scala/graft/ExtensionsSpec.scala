package graft

import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions entry point: the engine's functions are session
  * builtins with no driver-side registration call. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark // built with GraftExtensions

  test("extensions register builtins (no registerAll needed)") {
    // marker function exists only via the extensions path
    assert(spark.sql("SELECT graft_engine_version() AS v").head().getString(0)
      == "graft-0.2")
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS one,
        |       size(dequantize_vec(quantize_vec(array(1.0f, -2.0f, 3.0f)))) AS n,
        |       size(dequantize_vec(noop_embed('hello'))) AS d512
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 512)
    // NFC: decomposed e+U+0301 composes to one codepoint (the combining
    // mark is embedded directly — Spark's chr() is ASCII-only)
    val nfc = spark.sql(
      "SELECT length(nfc_normalize('café')) AS n").head()
    assert(nfc.getInt(0) == 4)
  }

  test("bpe_merge_pass is SQL-callable with literal pairs, and only those") {
    val out = spark.sql(
      "SELECT bpe_merge_pass(array('a', 'a', 'a'), 'a', 'a') AS m")
      .head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
    val e = intercept[Exception](
      spark.sql("SELECT bpe_merge_pass(array('a'), 'a', lower('B'))").head())
    assert(e.getMessage.contains("string literals") ||
      e.getCause != null && e.getCause.getMessage.contains("string literals"))
  }

  test("function descriptions are visible to DESCRIBE FUNCTION") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("cosine_sim"), desc)
  }
}
