package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Embedder, NoopProvider, TextKernels, VectorKernels, gf}

/** M8 embed hand-off (batched mapPartitions provider calls) and F10 chat
  * prompt assembly. */
class EmbedderSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("embedColumn matches the noop_embed expression for every row") {
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "text").limit(100)
    val viaBatch = Embedder.embedColumn(docs, "text", NoopProvider(64), batchSize = 7)
      .select(col("doc_id"), col("qvec"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val viaExpr = docs.select(col("doc_id"), gf.noop_embed(col("text"), 64).as("qvec"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(viaBatch.keySet == viaExpr.keySet)
    viaBatch.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(v, viaExpr(id)), s"doc $id")
    }
  }

  test("batch size does not change results") {
    val docs = Tables.load(spark, SparkSuite.sf0001, "documents")
      .select("doc_id", "text").limit(50)
    val a = Embedder.embedColumn(docs, "text", NoopProvider(32), batchSize = 1)
      .select("doc_id", "qvec").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    val b = Embedder.embedColumn(docs, "text", NoopProvider(32), batchSize = 1000)
      .select("doc_id", "qvec").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(a == b)
  }

  test("chat prompt assembly mirrors the reference format") {
    val msgs = TextKernels.chatMessages(
      history = Seq("hi", "hello!", "what's new"),
      documentsJson = Seq("""{"a": "alpha"}""", """{"b": "beta"}"""),
      prefix = "Report", text = "what does it say?")
    assert(msgs.map(_._1) == Seq("user", "assistant", "user", "user"))
    val q = msgs.last._2
    assert(q.startsWith("I have 2 text document that I'd like to use as context " +
      "for my question. Here's the relevant parts:\n\n"))
    assert(q.contains("\"\"\"a: alpha.\"\"\"\n"))
    assert(q.contains("\"\"\"b: beta.\"\"\"\n"))
    assert(q.endsWith("My question is: Report. what does it say?"))
  }

  test("chat prompt with no documents and no prefix") {
    val msgs = TextKernels.chatMessages(Nil, Nil, "", "just asking")
    assert(msgs == Seq(("user", "My question is: just asking")))
  }
}
