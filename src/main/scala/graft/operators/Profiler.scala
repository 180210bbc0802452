package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiler for training-lake intake: per column — null
  * count, approximate distinct (HLL++, mergeable, fixed memory), and
  * min/max for orderable types. Everything rides ONE aggregation pass
  * over the table (a single scan at 100 TB), not a pass per column. */
object Profiler {

  final case class ColProfile(column: String, dtype: String, nRows: Long,
      nNulls: Long, approxDistinct: Long, min: String, max: String)

  def profile(df: DataFrame, rsd: Double = 0.05): Seq[ColProfile] = {
    val cols = df.schema.fields
    def orderable(t: DataType): Boolean = t match {
      case _: NumericType | StringType | DateType | TimestampType | BooleanType => true
      case _ => false
    }
    val aggs = cols.flatMap { f =>
      val c = col(s"`${f.name}`") // backtick: dots in names stay literal
      Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        sum(when(c.isNull, 1).otherwise(0)).as(s"__nulls_${f.name}"),
        approx_count_distinct(c, rsd).as(s"__adist_${f.name}")) ++
        (if (orderable(f.dataType))
          Seq(min(c).cast("string").as(s"__min_${f.name}"),
            max(c).cast("string").as(s"__max_${f.name}"))
        else Seq(lit(null).cast("string").as(s"__min_${f.name}"),
          lit(null).cast("string").as(s"__max_${f.name}")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { f =>
      ColProfile(f.name, f.dataType.simpleString,
        row.getAs[Long](s"__n_${f.name}"),
        row.getAs[Long](s"__nulls_${f.name}"),
        row.getAs[Long](s"__adist_${f.name}"),
        Option(row.getAs[String](s"__min_${f.name}")).orNull,
        Option(row.getAs[String](s"__max_${f.name}")).orNull)
    }.toSeq
  }
}
