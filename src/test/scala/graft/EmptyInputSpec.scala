package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run (returning an empty or constant
  * result) against schema-correct ZERO-ROW tables — the guard against
  * driver-side head()/getLong NPEs on empty aggregates, which only ever
  * surface in production on an empty partition or a fresh deployment. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Empty twin of the testdata dir: same raw parquet schemas, 0 rows. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("sf0").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      spark.read.parquet(s"${SparkSuite.sf0001}/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on zero-row tables") {
      val rows = fn(spark, emptyDir).collect()
      assert(rows != null)
    }
  }
}
