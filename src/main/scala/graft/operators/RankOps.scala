package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Exact global ranking without the single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the whole input to
  * one task — the classic scale cliff (WindowExec even warns). The exact
  * distributed alternative: range-partitioned sort, then per-partition
  * offsets — `zipWithIndex` runs one lightweight count job over the
  * sorted partitions and assigns contiguous indices without moving data
  * again. Rows must be given a deterministic total order (break ties!)
  * for ranks to be reproducible.
  */
object RankOps {

  /** Appends `rankCol` = 1-based global row number under `order`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
