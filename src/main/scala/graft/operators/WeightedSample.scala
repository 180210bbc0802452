package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement, distributed and reproducible.
  *
  * The mixture-construction step after planning (q75 decides RATES per
  * domain; this picks the DOCUMENTS): exact-k per group via the
  * Efraimidis-Spirakis one-pass scheme — every row gets the key
  * u^(1/w) with u a seeded-hash uniform in (0,1), and the k largest
  * keys per group are the sample. One scan, a bounded partial top-k
  * aggregate on the group key (≤ k rows per group per task cross the
  * wire), and a size-gated winner semi join; no global sort, no
  * single-task group window, no driver-side state, same result at any
  * partitioning because the key depends only on (seed, row id, weight).
  *
  * The transcendental key means bit-parity across engines is NOT
  * guaranteed (pow/log differ at ulp level), so this operator is
  * spec-gated (determinism, exact-k, weight-bias properties) while the
  * oracle-gated twin q85 uses integer-exact expected-k Bernoulli
  * arithmetic instead. Reference scope: the reference engine has no
  * sampler beyond the uniform index-build sample (dnc/dnc.go:159);
  * this is a pipeline extension.
  */
object WeightedSample {

  /** Seeded uniform in (0,1] from a row id: 63 usable xxhash64 bits.
    * (0 maps to 1.0 — pow(1, 1/w) = 1 stays a valid key.) */
  private def uniform(id: Column, seed: Long): Column =
    (pmod(xxhash64(lit(seed), id), lit(Long.MaxValue)).cast("double") + 1.0) /
      Long.MaxValue.toDouble

  /** A-ES sort key u^(1/w); rows with non-positive weight get key -1
    * (never sampled). */
  def aresKey(id: Column, weight: Column, seed: Long): Column =
    when(weight > 0,
      pow(uniform(id, seed), lit(1.0) / weight.cast("double")))
      .otherwise(lit(-1.0))

  /** The k rows with the largest A-ES keys per group — a weighted
    * sample without replacement of size min(k, group size), inclusion
    * odds rising with weight. `id` must be GLOBALLY unique per row (it
    * seeds the per-row uniform and keys the winner join) and integral
    * OR string — the winner semi join keys on the id's NATIVE type, so
    * URL/hash-keyed crawl corpora sample directly with no pre-mapping
    * to longs; ties are broken by id for determinism.
    *
    * Scale shape: the winner set comes from the bounded TopKAgg
    * ([[graft.functions.gf.top_k_by]] / [[graft.functions.gf.top_k_by_str]]
    * — buffer ≤ k per group per task, map-side combined), NOT a
    * `row_number().over(partitionBy(group))` window: the window form
    * shuffles and sorts EVERY row of a group through one task, so a
    * corpus-scale group (one source holding most of a crawl) is a
    * single-task cliff. Winners are |groups|·k ids — size-gated back
    * onto the keyed rows as a semi join. */
  def exactKPerGroup(df: DataFrame, group: Column, id: Column,
                     weight: Column, k: Int, seed: Long): DataFrame = {
    // fail FAST on id types the winner join can't key losslessly (a
    // fractional double collides under a long cast, a binary blob is
    // lossy as UTF-8 — both are silent wrongness): integral ids ride
    // the long TopKAgg, strings the string twin, anything else must be
    // cast explicitly by the caller
    val idType = df.select(id).schema.head.dataType.typeName
    val integral = Seq("long", "integer", "short", "byte").contains(idType)
    require(integral || idType == "string",
      s"exactKPerGroup keys the winner semi join on the row id's native " +
        s"type; integral and string ids are supported (got $idType) — " +
        "cast the id to string explicitly if that cast is lossless")
    val keyed = df.withColumn("_wskey", aresKey(id, weight, seed))
      .filter(col("_wskey") >= 0)
    val topk =
      if (integral) graft.functions.gf.top_k_by(col("_wskey"), id.cast("long"), k)
      else graft.functions.gf.top_k_by_str(col("_wskey"), id, k)
    val winners = keyed
      .groupBy(group)
      .agg(topk.as("_tk"))
      .select(explode(col("_tk")).as("_w"))
      .select(col("_w._2").as("_wsid"))
    val joinKey =
      if (integral) id.cast("long") === col("_wsid") else id === col("_wsid")
    keyed
      .join(graft.operators.DedupOps.gateBroadcast(winners), joinKey,
        "left_semi")
      .drop("_wskey")
  }
}
