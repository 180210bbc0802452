package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must survive NULL values in nullable payload
  * columns (text/lang/source, event props/value) — production corpora
  * always contain them, the synthetic testdata never does, and a Scala
  * UDF given a null String throws NPE unless explicitly guarded. */
class NullInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Testdata twin where every third document's text (and some lang /
    * source / props values) is NULL. */
  private lazy val nulledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("sfnull").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      val raw = spark.read.parquet(s"${SparkSuite.sf0001}/$t.parquet")
      val out = t match {
        case "documents" => raw
          .withColumn("text", when(col("doc_id") % 3 === 0, lit(null: String))
            .otherwise(col("text")))
          .withColumn("lang", when(col("doc_id") % 5 === 0, lit(null: String))
            .otherwise(col("lang")))
          .withColumn("source", when(col("doc_id") % 7 === 0, lit(null: String))
            .otherwise(col("source")))
        case "events" => raw
          .withColumn("props", when(col("event_id") % 4 === 0, lit(null: String))
            .otherwise(col("props")))
        case _ => raw
      }
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name survives null payload values") {
      val rows = fn(spark, nulledDir).collect()
      assert(rows != null)
    }
  }
}
