package graft

import org.scalatest.funsuite.AnyFunSuite

/** Frozen expected outputs at sf0.001 for the queries the DuckDB
  * oracle cannot express (k-means / custom-kernel / sketch dependent). They are
  * fully deterministic (seeded builds, stub codecs), so any drift is a
  * regression — this is their row-level gate, alongside the driver's
  * rows-only check and the semantic specs (recall, subset, parity). */
class GoldenRowsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def canon(name: String): String = {
    val df = SparkEntry.queries(name)(spark, SparkSuite.sf0001)
    df.collect().map(_.toSeq.mkString("|")).sorted.mkString(" ;; ")
  }

  test("q26_ann_ivf golden rows") {
    assert(canon("q26_ann_ivf") ==
      "0|1.0 ;; 12|0.311 ;; 212|0.2814 ;; 225|0.3151 ;; 248|0.2393 ;; " +
      "260|0.2987 ;; 262|0.2387 ;; 483|0.3005 ;; 59|0.2487 ;; 82|0.2494")
  }

  test("q89_ann_pq golden rows") {
    assert(canon("q89_ann_pq") ==
      "0|1.0 ;; 12|0.311 ;; 17|0.3345 ;; 212|0.2814 ;; 225|0.3151 ;; " +
      "260|0.2987 ;; 347|0.2745 ;; 402|0.2745 ;; 483|0.3005 ;; 73|0.2972")
  }

  test("q27_flatten_chunks golden rows") {
    assert(canon("q27_flatten_chunks") ==
      "click|210|630 ;; error|201|603 ;; purchase|202|606 ;; " +
      "signup|199|597 ;; view|188|564")
  }

  test("q28_upload_pipeline golden rows") {
    assert(canon("q28_upload_pipeline") ==
      "0|54 ;; 1|45 ;; 2|45 ;; 3|43 ;; 4|49 ;; 5|45 ;; 6|62 ;; 7|60 ;; " +
      "8|47 ;; 9|50")
  }

  test("q97_ann_opq golden rows") {
    assert(canon("q97_ann_opq") ==
      "0|1.0 ;; 12|0.311 ;; 17|0.3345 ;; 212|0.2814 ;; 225|0.3151 ;; " +
      "260|0.2987 ;; 347|0.2745 ;; 402|0.2745 ;; 483|0.3005 ;; 73|0.2972")
  }

  test("q95_bpe_merges golden rows") {
    assert(canon("q95_bpe_merges") ==
      "1|e|r|4650 ;; 2|e|</w>|4644 ;; 3|n|</w>|2898 ;; 4|o|r|2880 ;; " +
      "5|t|</w>|2850 ;; 6|er|</w>|2781 ;; 7|o|w|2763 ;; 8|ow|</w>|2763")
  }

  test("q128_unigram_lm golden rows") {
    // the sf0.001 corpus draws from a small whole-word vocabulary, so the
    // trainer converges to whole words as pieces (ranks 1-31) with the
    // coverage floor holding every single char at the uniform tail logp
    assert(canon("q128_unigram_lm") ==
      "10|key|-3.387005 ;; 11|join|-3.396575 ;; 12|merge|-3.397644 ;; " +
      "13|group|-3.398714 ;; 14|query|-3.398714 ;; 15|a|-3.401931 ;; " +
      "16|vector|-3.401931 ;; 17|hash|-3.410561 ;; 18|slow|-3.41273 ;; " +
      "19|stream|-3.414904 ;; 1|scan|-3.346564 ;; 20|filter|-3.417083 ;; " +
      "21|fast|-3.421454 ;; 22|batch|-3.424746 ;; 23|spark|-3.424746 ;; " +
      "24|the|-3.424746 ;; 25|table|-3.432468 ;; 26|small|-3.43802 ;; " +
      "27|data|-3.44025 ;; 28|big|-3.446969 ;; 29|customer|-3.448093 ;; " +
      "2|column|-3.352681 ;; 30|row|-3.474305 ;; 31|dup|-6.870895 ;; " +
      "32|b|-10.931338 ;; 33|c|-10.931338 ;; 34|d|-10.931338 ;; " +
      "35|e|-10.931338 ;; 36|f|-10.931338 ;; 37|g|-10.931338 ;; " +
      "38|h|-10.931338 ;; 39|i|-10.931338 ;; 3|window|-3.354728 ;; " +
      "40|j|-10.931338 ;; 41|k|-10.931338 ;; 42|l|-10.931338 ;; " +
      "43|m|-10.931338 ;; 44|n|-10.931338 ;; 45|o|-10.931338 ;; " +
      "46|p|-10.931338 ;; 47|q|-10.931338 ;; 48|r|-10.931338 ;; " +
      "49|s|-10.931338 ;; 4|order|-3.355753 ;; 50|t|-10.931338 ;; " +
      "51|u|-10.931338 ;; 52|v|-10.931338 ;; 53|w|-10.931338 ;; " +
      "54|y|-10.931338 ;; 5|sort|-3.356779 ;; 6|part|-3.368137 ;; " +
      "7|agg|-3.378575 ;; 8|value|-3.381728 ;; 9|line|-3.385948")
  }

  test("q129_unigram_fertility golden rows") {
    // fertility 1.0 everywhere: with whole words in the vocab, every word
    // Viterbi-segments to itself — the designed contrast to q96's 8-merge
    // BPE (~4.55 pieces/word on the same corpus)
    assert(canon("q129_unigram_fertility") ==
      "de|4070|1.0|4.472 ;; en|10343|1.0|4.4991 ;; es|4516|1.0|4.5106 ;; " +
      "fr|4926|1.0|4.5106 ;; zh|4084|1.0|4.5037")
  }

  test("q96_bpe_fertility golden rows") {
    assert(canon("q96_bpe_fertility") ==
      "de|4070|4.5568|0.9814 ;; en|10343|4.5651|0.9855 ;; " +
      "es|4516|4.5682|0.9874 ;; fr|4926|4.5587|0.9894 ;; " +
      "zh|4084|4.549|0.99")
  }

  test("q32_blocked_neardup golden rows") {
    assert(canon("q32_blocked_neardup") ==
      "106|263|0.426 ;; 119|403|0.4188 ;; 136|241|0.4348 ;; " +
      "154|342|0.4457 ;; 171|358|0.47 ;; 212|248|0.4147 ;; " +
      "229|472|0.4126 ;; 233|414|0.4319 ;; 23|172|0.4191 ;; " +
      "23|319|0.4532 ;; 329|361|0.4172 ;; 330|457|0.4316 ;; " +
      "352|411|0.4573 ;; 365|429|0.4163 ;; 372|418|0.4322 ;; " +
      "390|483|0.4543 ;; 396|493|0.4306 ;; 53|134|0.4489 ;; " +
      "85|227|0.4386 ;; 93|243|0.4141")
  }

  test("q34_media_pipeline golden rows") {
    assert(canon("q34_media_pipeline") ==
      "audio|167|830.994|334 ;; image|167|832.6228|334 ;; " +
      "video|166|831.0843|332")
  }

  test("q80_cardinality_sketch golden rows") {
    // sf0.001 has no duplicate texts, so every estimate lands exactly on
    // the group count — the golden also re-proves HLL exactness on small n
    assert(canon("q80_cardinality_sketch") ==
      (0 to 19).map(i => s"src$i|25|25|0.0").sorted.mkString(" ;; "))
  }

  test("q81_length_quantiles golden rows") {
    assert(canon("q81_length_quantiles") ==
      "de|71|55|93|99 ;; en|193|53|90|98 ;; es|80|60|90|99 ;; " +
      "fr|82|62|91|99 ;; zh|74|56|87|96")
  }
}
