package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality expectations — the Deequ-shaped constraint
  * suite a pipeline runs before (and after) every curation stage. The
  * reference engine has no validation tier; this is a pipeline extension
  * in the spirit of its NOT NULL / unique-name schema constraints
  * (database/model.go:48-67), lifted to declarative checks over any
  * DataFrame.
  *
  * Scale shape: every check compiles to an aggregate expression over ONE
  * scan of the table — `run` builds a single `agg(...)` so Spark plans
  * one aggregate pipeline regardless of how many checks are attached.
  * Uniqueness adds count(DISTINCT), which Catalyst rewrites into a keyed
  * partial aggregate feeding the same pipeline (Expand when several
  * distincts mix) — either way still ONE table read, plan-pinned in
  * AuditSpec. The report is |checks| rows produced by an exchange-free
  * `stack` over the 1-row aggregate, so validating a 100 TB table costs
  * exactly one scan plus a distinct-key shuffle. */
object Expectations {

  /** One declarative constraint: `violations` must evaluate, inside an
    * aggregate over the whole table, to the number of offending rows
    * (0 = pass). */
  final case class Check(name: String, violations: Column)

  /** Rows where `cond` does NOT hold (null counts as a violation —
    * unknown is not a pass). */
  def holds(name: String, cond: Column): Check =
    Check(name, sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)))

  def notNull(c: String): Check =
    holds(s"not_null($c)", col(c).isNotNull)

  def inSet(c: String, values: Seq[String]): Check =
    holds(s"in_set($c)", col(c).isin(values: _*))

  def nonNegative(c: String): Check =
    holds(s"non_negative($c)", col(c) >= 0)

  /** count(*) == count(DISTINCT c) — exact, same single pass (Expand). */
  def unique(c: String): Check =
    Check(s"unique($c)", count(lit(1)) - countDistinct(col(c)))

  /** Run every check in one aggregate over one scan; emit the long-form
    * report (check, violations, pass) the driver can gate a stage on. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = count(lit(1)).as("_rows") +:
      checks.map(c => coalesce(c.violations, lit(0L)).cast("long").as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks
      .map(c => s"'${c.name}', `${c.name}`").mkString(", ")
    one.selectExpr("_rows AS n_rows",
        s"stack(${checks.size}, $stackArgs) AS (check, violations)")
      .select(col("check"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("pass"))
  }
}
