package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Star-mode candidate generation (q133/q134) against the all-pairs
  * banded forms (q21b/q124b) on a SKEWED fixture — a planted
  * near-identical mega-cluster, the corpus shape that makes the
  * all-pairs within-bucket join Θ(m²). The spec pins (a) verdict
  * row-identity between the two modes, (b) the candidate-volume gap
  * that motivates star mode, (c) component-identity for the simhash
  * star mode, (d) CurationRun's above-threshold path riding the star
  * verdict. The 10M-doc / 100k-member wall-clock claim lives in
  * StarScaleProbe (BASELINE.md). */
class DedupStarSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** ~20 base tokens per cluster; each mega member appends ONE unique
    * token, so any two members share 18 of their ~19 distinct shingles
    * (J ≈ 0.9 > 0.8 — every star edge passes the exact verify). */
  private def megaText(cl: String, i: Long): String =
    (0 until 20).map(t => s"${cl}w$t").mkString(" ") + s" ${cl}u$i"

  /** Skewed fixture: one MEGA near-identical cluster (`mega` members,
    * ids 1000+), 20 exact-dup pairs (ids 0-39), a second 5-member
    * near-dup cluster (ids 100-104), 30 singletons (ids 200-229), and
    * one empty-text doc (id 500). */
  private def writeFixture(mega: Int): String = {
    import spark.implicits._
    val megaDocs = (0 until mega).map(i => (1000L + i, megaText("m", i)))
    val exactPairs = (0 until 20).flatMap { i =>
      val t = s"ea$i eb$i ec$i ed$i ee$i ef$i"
      Seq((i * 2L, t), (i * 2L + 1, t))
    }
    val smallCluster = (0 until 5).map(i => (100L + i, megaText("c", i)))
    val singles = (0 until 30).map(j =>
      (200L + j, s"zs${j}a zs${j}b zs${j}c zs${j}d zs${j}e"))
    val empty = Seq((500L, ""))
    val dir = java.nio.file.Files.createTempDirectory("star").toString
    (megaDocs ++ exactPairs ++ smallCluster ++ singles ++ empty)
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // identity fixture: 400-member mega cluster — big enough that the
  // all-pairs form pays C(400,2)·BANDS candidate rows, small enough to
  // run it in a spec
  private lazy val dir400 = writeFixture(400)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("star verdict is row-identical to the all-pairs banded verdict " +
    "on the mega-cluster fixture") {
    val allPairs = rowsOf(DedupQueries.q124bDedupVerdictBanded(spark, dir400))
    val star = rowsOf(DedupQueries.q134DedupVerdictStar(spark, dir400))
    assert(star == allPairs && star.nonEmpty)
  }

  test("star verdict is row-identical to the all-pairs banded verdict " +
    "on the real sf0.001 corpus") {
    val allPairs = rowsOf(
      DedupQueries.q124bDedupVerdictBanded(spark, SparkSuite.sf0001))
    val star = rowsOf(
      DedupQueries.q134DedupVerdictStar(spark, SparkSuite.sf0001))
    assert(star == allPairs && star.nonEmpty)
  }

  test("star candidates are linear in the mega-cluster where all-pairs " +
    "are quadratic, and span the same components") {
    val n = spark.read.parquet(s"$dir400/documents.parquet").count()
    val star = DedupQueries.q133MinhashStar(spark, dir400)
    val starCount = star.count()
    // star: ≤ BANDS edges per doc (one per band bucket, minus the mins)
    assert(starCount <= 4 * n, s"star candidates not linear: $starCount")
    // all-pairs: the 400-member cluster alone contributes ~C(400,2)
    // (less the ~1.4% of J≈0.9 pairs whose 4 bands all miss)
    val allCount = DedupQueries.q21bMinhashFast(spark, dir400).count()
    assert(allCount >= 400L * 399 / 2 * 9 / 10,
      s"fixture lost its quadratic regime: $allCount")
    // identical connected components (the property the verdict relies on)
    def comps(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.DedupOps
        .connectedComponents(pairs, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(star.select("doc_a", "doc_b")) ==
      comps(DedupQueries.q21bMinhashFast(spark, dir400)
        .select("doc_a", "doc_b")))
  }

  test("10k-member mega cluster: star path completes with the cluster " +
    "essentially whole and one keeper per cluster") {
    // star-only at 10k members (all-pairs would emit ~2×10⁸ candidate
    // rows here — that regime is measured in StarScaleProbe, not specs).
    // ~1.4% of members are isolated by LSH ITSELF (a member whose
    // unique-token shingles win all 4 minhash bands shares no bucket
    // with anyone — the 400-member fixture shows the same recall in
    // all-pairs mode), so the assertion is a ≥98% floor, not ==1.
    val dir = writeFixture(10000)
    val verdict = DedupQueries.q134DedupVerdictStar(spark, dir)
      .filter(col("doc_id") >= 1000L).pinToSpec()
    val clusters = verdict.select("cluster_id").distinct().count()
    assert(clusters <= 300, s"mega cluster split into $clusters")
    val biggest = verdict.groupBy("cluster_id").count()
      .agg(max("count")).head().getLong(0)
    assert(biggest >= 9700, s"main cluster only $biggest members")
    // one keeper per cluster: unique fps, no subsumption (base shingles
    // are df-capped away), so keep == rep_keep == one best per cluster
    assert(verdict.filter(col("keep")).count() == clusters)
    assert(verdict.count() == 10000)
  }

  test("simhash star components REFINE the all-pairs components") {
    // simhash verification is a RADIUS gate, so a star edge (min, x)
    // can fail hamming<=r even when x chains to min through closer
    // members — in the mega-cluster regime the cluster min shadows
    // every bucket, so far-from-min members drop instead of re-pairing
    // under a nearer min. Star therefore guarantees REFINEMENT
    // (edges ⊆ all-pairs edges ⇒ clusters only split — the same safe
    // direction as the banded form's own loss vs q24's exact form),
    // with identity on clusters tight around their min (exact dups:
    // hamming 0). The minhash star path (q134) doesn't share this
    // caveat: its Jaccard verify has margin (J≈1 vs the 0.8 gate).
    val sig = DedupQueries.simhashSig(spark, dir400)
    val starRows = DedupQueries.simhashBandedPairs(sig, 4, star = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allRows = DedupQueries.simhashBandedPairs(sig, 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(starRows.subsetOf(allRows) && starRows.nonEmpty)
    // exact-dup pairs (hamming 0, one two-member bucket family) must
    // survive star mode verbatim
    (0 until 20).foreach { i =>
      assert(starRows.contains((i * 2L, i * 2L + 1)), s"exact pair $i lost")
    }
    // refinement: every star component sits inside one all-pairs component
    def comps(pairs: Set[(Long, Long)]): Map[Long, Long] = {
      import spark.implicits._
      graft.operators.DedupOps.connectedComponents(
        pairs.toSeq.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val all = comps(allRows)
    comps(starRows).groupBy(_._2).values.foreach { grp =>
      assert(grp.keySet.map(all).size == 1,
        s"star merged distinct all-pairs clusters: ${grp.keySet}")
    }
  }

  test("CurationRun rides the star verdict above the corpus threshold") {
    // forced over the threshold: survivors come from q134 and the
    // manifest name records the star path
    val (surv, name) =
      CurationRun.curatedSurvivorsNamed(spark, dir400, 0L)
    assert(name == "banded-star")
    val starKeep = DedupQueries.q134DedupVerdictStar(spark, dir400)
      .filter(col("keep")).count()
    assert(surv.count() == starKeep)
  }

  /** Materialize small verdicts once for multi-assertion reads. */
  private implicit class PinnedSpec(df: org.apache.spark.sql.DataFrame) {
    def pinToSpec(): org.apache.spark.sql.DataFrame = df.localCheckpoint(true)
  }
}
