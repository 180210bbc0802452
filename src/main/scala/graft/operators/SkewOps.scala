package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100 TB.
  *
  * Spark already handles most skew: hash aggregation does map-side partial
  * combine, and AQE splits skewed shuffle/join partitions at runtime. These
  * helpers cover the residual cases where a SINGLE key's row set exceeds an
  * executor (web-crawl dedup where one boilerplate fingerprint owns 1% of
  * the corpus; a bot user owning half the event stream):
  *
  *  - [[saltedAgg]]: two-stage aggregation — rows spread over
  *    `key × salt` sub-groups, partials merged in a second (tiny) shuffle.
  *    Works for any algebraic aggregate (count/sum/min/max).
  *  - [[saltedJoin]]: replicate the SMALL side `factor`× with a salt
  *    column, salt the big side deterministically, equi-join on
  *    (key, salt) — each hot key's rows land in `factor` tasks instead
  *    of one.
  */
object SkewOps {

  /** Deterministic per-row salt in [0, factor): hash of the whole row —
    * uniform even when the key column is constant. */
  private def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(factor))

  /** Two-stage salted aggregation. `partials` aggregate within
    * (keys, salt); `merges` combine the partials per keys. Example:
    * {{{
    * saltedAgg(events, Seq($"user_id"), 32)(
    *   partials = Seq(count(lit(1)).as("n"), sum($"value").as("s")),
    *   merges   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}} */
  def saltedAgg(df: DataFrame, keys: Seq[Column], factor: Int)(
      partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("_salt", rowSalt(df, factor))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)

  /** Salted equi-join: big side salted per row, small side exploded
    * `factor`×, joined on key + salt. Row multiplicity identical to the
    * plain join (each big row matches exactly its salt's replica). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt", rowSalt(big, factor))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit(_)): _*)))
    saltedBig.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
