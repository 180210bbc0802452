package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** String/document kernels.
  *
  * `flatten` and `split` mirror the reference's canonical-text rules
  * byte-for-byte (reference server/format.go:17-108) — including its
  * newline-placement quirks in map flattening — because the upload
  * pipeline's chunk boundaries (and therefore embeddings) depend on them.
  *
  * The analysis functions (langId, quality, fingerprints, minhash, simhash)
  * are our large-scale-pipeline extensions; they are deliberately built on
  * engine-portable primitives (md5 hex, whitespace tokens) so the DuckDB
  * oracle can reproduce them exactly.
  */
object TextKernels {

  private val mapper = new ObjectMapper()
  private val excessNewline = "\n\n+".r

  /** One BPE merge pass (Sennrich et al. 2016 tokenizer training): the
    * left-to-right greedy non-overlapping replacement of the adjacent
    * symbol pair (a, b) by its concatenation — ["a","a","a"] under merge
    * (a,a) → ["aa","a"], the textbook scan order. Operates on Catalyst
    * ArrayData so [[BpeMergePass]] stays inside whole-stage codegen. */
  def bpeMergePass(sym: org.apache.spark.sql.catalyst.util.ArrayData,
      a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = sym.numElements()
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      val s = sym.getUTF8String(i)
      if (i + 1 < n && s == a && sym.getUTF8String(i + 1) == b) {
        out.add(org.apache.spark.unsafe.types.UTF8String.concat(a, b))
        i += 2
      } else { out.add(s); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(Array.empty[AnyRef]))
  }

  /** JSON text → canonical flattened text (reference server/format.go:17-89). */
  def flattenJson(json: String): String =
    try flatten(mapper.readTree(json))
    catch { case _: Exception => formatString(json) } // non-JSON → plain string

  def flatten(node: JsonNode): String = {
    if (node == null || node.isNull) "null."
    else if (node.isTextual) formatString(node.asText())
    else if (node.isNumber) formatFloatShortest(node.asDouble())
    else if (node.isBoolean) { if (node.asBoolean()) "true." else "false." }
    else if (node.isArray) {
      val items = node.elements().asScala.toSeq
      items.map(flatten).mkString("\n")
    } else if (node.isObject) {
      // Mirrors reference flattenMap (format.go:66-89): keys sorted; each
      // line of the flattened value prefixed with "key: "; newline emitted
      // only when NOT the last line of the value AND NOT the last key.
      val keys = node.fieldNames().asScala.toSeq.sorted
      val sb = new StringBuilder
      keys.zipWithIndex.foreach { case (key, idx) =>
        val lines = flatten(node.get(key)).split("\n", -1)
        lines.zipWithIndex.foreach { case (line, jdx) =>
          sb.append(key).append(": ").append(line)
          if (jdx != lines.length - 1 && idx != keys.length - 1) sb.append("\n")
        }
      }
      sb.toString
    } else node.toString
  }

  /** reference format.go:37-46 */
  def formatString(value0: String): String = {
    var value = value0.replace("\r", "")
    value = excessNewline.replaceAllIn(value, "\n")
    value = value.trim
    if (value.endsWith("\n")) value = value.dropRight(1)
    if (!value.endsWith(".")) value + "." else value
  }

  /** Go strconv.FormatFloat(v, 'f', -1, 32): the shortest fixed-notation
    * decimal that round-trips to the same float32, preserving "-0".
    *
    * JDK 17's Float.toString is pre-Ryu (can emit non-shortest digits), so
    * we search precisions 1..9 explicitly: the nearest p-significant-digit
    * decimal (via %e rounding) is tested for bit-exact round-trip, which is
    * precisely the shortest/nearest rule Go's Ryu implements. */
  def formatFloatShortest(v: Double): String = {
    val f = v.toFloat
    val bits = java.lang.Float.floatToIntBits(f)
    if (java.lang.Float.isNaN(f)) return "NaN"
    if (java.lang.Float.isInfinite(f)) return if (f > 0) "+Inf" else "-Inf"
    if (f == 0.0f) return if (bits < 0) "-0" else "0"
    var p = 1
    var s: String = null
    while (s == null && p <= 9) {
      val cand = String.format("%." + (p - 1) + "e", java.lang.Double.valueOf(f.toDouble))
      if (java.lang.Float.floatToIntBits(java.lang.Float.parseFloat(cand)) == bits) s = cand
      p += 1
    }
    if (s == null) s = String.format("%.9e", java.lang.Double.valueOf(f.toDouble))
    new java.math.BigDecimal(s).stripTrailingZeros().toPlainString
  }

  /** Greedy word-budget chunker (reference server/format.go:91-108).
    * Note the reference always joins with a single space and re-prepends
    * the prefix on each new chunk. */
  def split(prefix: String, text: String, ctxNum: Int): Array[String] = {
    val maxWords = ((ctxNum * 9) / 10) / 4
    val out = mutable.ArrayBuffer.empty[String]
    var current = prefix
    var currentNumWords = 0
    text.split("\n", -1).foreach { sentence =>
      val numWords = fields(sentence).length
      if (numWords + currentNumWords > maxWords && current != "") {
        out += current
        current = prefix
        currentNumWords = 0
      }
      current = current + " " + sentence
      currentNumWords += numWords
    }
    out += current
    out.toArray
  }

  /** Go strings.Fields: split on whitespace runs, no empties. */
  def fields(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  // ---- analysis extensions ----

  /** Token-level word shingles (n-grams joined by single space) over
    * lowercase whitespace tokens — the dedup unit for MinHash/Jaccard. */
  def shingles(text: String, n: Int): Array[String] = {
    val toks = fields(text.toLowerCase)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty else Array(toks.mkString(" "))
    } else
      (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toArray
  }

  // MD5 digests dominate the minhash/simhash kernels (docs × shingles × k
  // calls), so reuse the digest per thread and hex-encode via table lookup.
  private val md5Digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** MinHash signature: for each of k seeded "permutations", the minimum
    * md5 hex of `"<seed>:<shingle>"`. md5-hex min is engine-portable (the
    * DuckDB oracle computes the identical value). Empty doc → all "z". */
  def minhash(text: String, n: Int, k: Int): Array[String] = {
    val sh = shingles(text, n)
    Array.tabulate(k) { seed =>
      if (sh.isEmpty) "z"
      else sh.iterator.map(s => md5Hex(s"$seed:$s")).min
    }
  }

  /** LSH band keys: the k-length signature cut into `bands` groups of
    * k/bands values, each group md5'd into one bucket key. */
  def lshBands(sig: Array[String], bands: Int): Array[String] = {
    val r = sig.length / bands
    Array.tabulate(bands)(b => b.toString + ":" + md5Hex(sig.slice(b * r, (b + 1) * r).mkString("|")))
  }

  /** Fast k-permutation MinHash via Kirsch-Mitzenmacher double hashing:
    * ONE md5 per shingle yields (h1, h2) = (60-bit, 56-bit) halves of
    * the digest, and permutation i scores the shingle as h1 + i·h2 —
    * two universal hashes simulate k independent ones with the same
    * LSH collision guarantees (Kirsch & Mitzenmacher, ESA'06). The
    * classic kernel ([[minhash]]) digests every shingle k TIMES
    * (docs × shingles × k md5 calls — the measured bottleneck of the
    * 10M pair-gen sweep); this one digests once. Bounds keep every
    * value in signed-64 range on BOTH engines (h1 < 2⁶⁰, i·h2 <
    * 15·2⁵⁶ < 2⁶⁰), so the DuckDB oracle reproduces the arithmetic
    * exactly; empty docs take Long.MaxValue sentinels (the 'z'
    * analogue). */
  def minhashFast(text: String, n: Int, k: Int): Array[Long] = {
    val sh = shingles(text, n)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val hex = md5Hex(sh(i))
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(15, 29), 16)
      var s = 0
      while (s < k) {
        val v = h1 + s * h2
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    sig
  }

  /** Band keys over a long-valued signature (fast-minhash twin of
    * [[lshBands]]): values joined by '|' in decimal, md5'd per band. */
  def lshBandsLong(sig: Array[Long], bands: Int): Array[String] = {
    val r = sig.length / bands
    Array.tabulate(bands)(b =>
      b.toString + ":" + md5Hex(sig.slice(b * r, (b + 1) * r).mkString("|")))
  }

  /** 64-bit SimHash over lowercase tokens (fnv1a64 token hashes, bitwise
    * majority vote). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    fields(text.toLowerCase).foreach { t =>
      val h = VectorKernels.fnv1a64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hammingDist64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Unicode NFC canonical composition (é as e+◌́ → single é, etc.) —
    * the normalization pass curation pipelines run before fingerprinting
    * so visually-identical texts dedup together. Codegen entry for
    * [[NfcNormalize]]; DuckDB's `nfc_normalize` replicates it (both are
    * Unicode-conformant canonical composition). */
  def nfcU(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Engine-portable 64-bit SimHash rendered as 16 hex chars (nibble p
    * holds bits p*4..p*4+3, LSB-first within the nibble). Token hash =
    * first 16 hex chars of md5(token); bit i of the signature is the
    * majority vote of bit (i%4) of nibble (i/4) across tokens. Built on
    * md5-hex + integer ops only, so the DuckDB oracle reproduces it
    * exactly (unlike [[simhash64]]'s fnv1a, which SQL can't express). */
  def simhashMd5Hex(text: String): String = {
    val counts = new Array[Int](64)
    fields(text.toLowerCase).foreach { t =>
      val h = md5Hex(t)
      var p = 0
      while (p < 16) {
        val v = Character.digit(h.charAt(p), 16)
        var b = 0
        while (b < 4) {
          if (((v >> b) & 1) == 1) counts(p * 4 + b) += 1 else counts(p * 4 + b) -= 1
          b += 1
        }
        p += 1
      }
    }
    val hex = "0123456789abcdef"
    val sb = new StringBuilder(16)
    var p = 0
    while (p < 16) {
      var v = 0
      var b = 0
      while (b < 4) { if (counts(p * 4 + b) > 0) v |= (1 << b); b += 1 }
      sb.append(hex.charAt(v))
      p += 1
    }
    sb.toString
  }

  /** Hamming distance between two equal-length hex signatures. */
  def hammingHex(a: String, b: String): Int = {
    var d = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      d += Integer.bitCount(Character.digit(a.charAt(i), 16) ^ Character.digit(b.charAt(i), 16))
      i += 1
    }
    d
  }

  /** Chat prompt assembly (reference F10, server/chat.go:125-172):
    * alternating user/assistant history, a document-context block of
    * `"""flattened"""` lines, then the prefixed question. Returns
    * (role, content) pairs. Mirrors the reference's quirks exactly —
    * "document" stays singular, only "part" pluralizes. */
  def chatMessages(history: Seq[String], documentsJson: Seq[String],
      prefix: String, text: String): Seq[(String, String)] = {
    val hist = history.zipWithIndex.map { case (content, idx) =>
      (if (idx % 2 == 0) "user" else "assistant", content)
    }
    val sb = new StringBuilder
    if (documentsJson.nonEmpty) {
      sb.append("I have ").append(documentsJson.length)
        .append(" text document that I'd like to use as context for my question. Here's the relevant part")
      if (documentsJson.length > 1) sb.append('s')
      sb.append(":\n\n")
      documentsJson.foreach { doc =>
        sb.append("\"\"\"").append(flattenJson(doc)).append("\"\"\"").append('\n')
      }
      sb.append('\n')
    }
    sb.append("My question is: ")
    sb.append(if (prefix.nonEmpty) s"$prefix. $text" else text)
    hist :+ ("user", sb.toString)
  }

  /** Rolling Karp-Rabin fingerprint over the token stream — order-sensitive
    * document fingerprint (vs md5 which is content-exact). */
  def rollingFingerprint(text: String): Long = {
    var h = 0L
    fields(text.toLowerCase).foreach { t =>
      h = h * 1000003L + VectorKernels.fnv1a64(t)
    }
    h
  }

  /** n-gram Jaccard similarity between two texts (exact, for verify stage). */
  def jaccard(a: String, b: String, n: Int): Double = {
    val sa = shingles(a, n).toSet
    val sb = shingles(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size.toDouble
      inter / (sa.size + sb.size - inter)
    }
  }

  /** Stopword-profile language ID over {en,de,fr,es,zh} — the languages in
    * the testdata. Counts whole-token stopword hits per language; argmax
    * with deterministic tie-break on language code. CJK codepoint presence
    * short-circuits to zh. */
  private val stopwords: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "im", "auf", "für"),
    "en" -> Set("the", "and", "is", "of", "to", "in", "a", "that", "it", "for", "on", "with", "as", "this", "are"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "de", "que", "en", "un", "una", "por", "con", "para", "no"),
    "fr" -> Set("le", "la", "les", "et", "est", "de", "que", "en", "un", "une", "pour", "dans", "ce", "pas", "sur")
  )

  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var i = 0
    val scanLimit = math.min(text.length, 4000)
    while (i < scanLimit) {
      val c = text.charAt(i)
      if ((c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf)) cjk += 1
      i += 1
    }
    if (cjk * 50 > scanLimit) return "zh"
    val toks = fields(text.toLowerCase)
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    stopwords.foreach { case (lang, set) =>
      val score = toks.count(set.contains)
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  /** Heuristic quality score in [0,1]: length band + alpha ratio +
    * punctuation sanity + stopword density + mean word length band. */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val len = text.length
    val toks = fields(text)
    if (toks.isEmpty) return 0.0
    val alpha = text.count(_.isLetter).toDouble / len
    val punct = text.count(c => ".,;:!?".indexOf(c) >= 0).toDouble / len
    val meanWord = toks.map(_.length).sum.toDouble / toks.length
    val lenScore = if (len >= 100 && len <= 20000) 1.0 else if (len >= 20) 0.5 else 0.0
    val alphaScore = if (alpha >= 0.6) 1.0 else alpha / 0.6
    val punctScore = if (punct <= 0.1) 1.0 else math.max(0.0, 1.0 - (punct - 0.1) * 5)
    val wordScore = if (meanWord >= 3 && meanWord <= 12) 1.0 else 0.5
    (lenScore + alphaScore + punctScore + wordScore) / 4.0
  }

  /** Floor log-prob for a character absent from the trained vocabulary —
    * keeps encode total (a segmentation always exists) without letting an
    * unknown char outscore any real piece. */
  val UnkCharLogp: Double = -100.0

  /** Viterbi segmentation of one word under a unigram piece LM (Kudo
    * 2018, the SentencePiece model): best[i] = max over pieces ending at
    * i of best[start] + logp(piece). Ties go to the LONGEST final piece
    * (ascending start scan + strict improvement), so the output is
    * deterministic. Operates on Catalyst types so [[UnigramSegment]]
    * stays inside whole-stage codegen; the vocab map is a per-plan
    * constant (bounded by the trained vocab size). */
  def unigramViterbi(w: org.apache.spark.unsafe.types.UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val best = new Array[Double](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val lpObj = vocab.get(s.substring(j, i))
          // unk fallback advances by CODE POINT, not code unit: a
          // supplementary char (emoji, rare CJK) is one 2-unit piece —
          // splitting it would emit lone surrogates whose UTF-8
          // encoding is invalid and the pieces would no longer
          // concatenate back to the input
          val lp =
            if (lpObj != null) lpObj.doubleValue()
            else if (i - j == 1 && !Character.isSurrogate(s.charAt(j)))
              UnkCharLogp
            else if (i - j == 2 && Character.isHighSurrogate(s.charAt(j)) &&
                Character.isLowSurrogate(s.charAt(j + 1)))
              UnkCharLogp
            else Double.NegativeInfinity
          if (lp != Double.NegativeInfinity) {
            val cand = best(j) + lp
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val pieces = new java.util.ArrayList[AnyRef]()
    var e = n
    while (e > 0) {
      val b = back(e)
      pieces.add(org.apache.spark.unsafe.types.UTF8String
        .fromString(s.substring(b, e)))
      e = b
    }
    java.util.Collections.reverse(pieces)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      pieces.toArray(Array.empty[AnyRef]))
  }
}
