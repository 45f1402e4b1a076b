package graft.datatools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder-prompt
  * first-class components): language-ID, quality scoring, token
  * counting, document fingerprinting. Everything here is built-in
  * Column expressions — whole-stage-codegen'd, ANSI-SQL-mirrorable for
  * the DuckDB oracle, zero UDFs on the hot path.
  */
object TextAnalysis {

  /** Stopword markers per language — the n-gram heuristic. Chosen to be
    * frequent function words with low cross-language collision.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq("的", "是", "在")
  )

  /** Occurrence count of a literal needle — (len(s) - len(replace(s, n)))
    * / len(n); identical arithmetic in Spark and DuckDB.
    */
  def countOccurrences(text: Column, needle: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) / lit(needle.length)

  /** Language score per language; ID = argmax with deterministic
    * alphabetical tiebreak.
    */
  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> markers.map(countOccurrences(padded, _)).reduce(_ + _)
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // greatest-score argmax; ties → alphabetically first language (the
    // reverse fold makes the earliest language win equal scores)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.reverse.foldLeft(lit("und"): Column) { case (acc, (lang, s)) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Whitespace token count: count of non-space runs. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-pieces + digits + punctuation as the
    * regex token classes a byte-pair tokenizer would split on.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality score in [0,1]: length band + punctuation ratio +
    * stopword ratio + alpha ratio (the classic Gopher/C4-style gates,
    * composed as a smooth score).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val punct = length(regexp_replace(text, "[^.!?,;:]", "")).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val stop = countOccurrences(concat(lit(" "), lower(text), lit(" ")), " the ") +
      countOccurrences(concat(lit(" "), lower(text), lit(" ")), " a ") +
      countOccurrences(concat(lit(" "), lower(text), lit(" ")), " and ")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val punctScore = least(punct / greatest(toks, lit(1.0)) * lit(5.0), lit(1.0))
    val alphaScore = alpha / greatest(len, lit(1.0))
    val stopScore = least(stop.cast("double") / greatest(toks, lit(1.0)) * lit(10.0), lit(1.0))
    round((lenScore * 0.3 + punctScore * 0.2 + alphaScore * 0.3 + stopScore * 0.2), 6)
  }

  // -------------------------------------------------------------------
  // FUSED single-pass twins (hot path). The Column versions above are
  // 15+ full-text regexp_replace scans per doc — each one a regex-engine
  // pass plus a string rebuild, the dominant text-stage cost at 100 TB.
  // The fused UDFs below compute the same integers/doubles in one or two
  // plain scans; TextFusedParitySpec pins bit-equality against the
  // Column stack (which in turn is pinned to the DuckDB oracle), so the
  // oracle contract is untouched.
  // -------------------------------------------------------------------

  /** Non-overlapping occurrence count — identical to the
    * `(len(s) - len(replace(s, n, ''))) / len(n)` arithmetic (replace
    * removes matches left-to-right, non-overlapping).
    */
  def countNonOverlap(s: String, needle: String): Int = {
    var c = 0
    var i = s.indexOf(needle)
    while (i >= 0) { c += 1; i = s.indexOf(needle, i + needle.length) }
    c
  }

  /** Scala twin of Spark's `trim` (strips U+0020 ONLY — not Java trim's
    * all-controls) — needed for token-count parity.
    */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def isRegexSpace(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Scala twin of [[tokenCount]]: `size(split(trim(text), "\\s+"))`
    * with the empty→0 guard. Spark's split uses limit -1, which keeps
    * BOTH the leading and the trailing empty token when the string
    * starts/ends with a separator — the run-count arithmetic below
    * reproduces that.
    */
  def tokenCountScala(text: String): Int = {
    val t = trimSpaces(text)
    if (t.isEmpty) 0
    else {
      var segments = 0
      var inTok = false
      var i = 0
      while (i < t.length) {
        val ws = isRegexSpace(t.charAt(i))
        if (!ws && !inTok) { segments += 1; inTok = true }
        else if (ws) inTok = false
        i += 1
      }
      segments + (if (isRegexSpace(t.charAt(0))) 1 else 0) +
        (if (isRegexSpace(t.charAt(t.length - 1))) 1 else 0)
    }
  }

  /** Half-up 6-decimal round — Spark's `round(col, 6)` on doubles. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fused language ID: one lowercase pass + 15 indexOf scans (no regex,
    * no string rebuilds). Same argmax + alphabetical tiebreak as
    * [[langId]].
    */
  def langIdScala(text: String): String = {
    val padded = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> markers.map(countNonOverlap(padded, _)).sum
    }
    val best = scores.map(_._2).max
    scores.collectFirst { case (l, s) if s > 0 && s == best => l }.getOrElse("und")
  }

  def langIdFused(text: Column): Column = {
    val f = udf(langIdScala _)
    f(text)
  }

  /** Fused quality score: single char scan for punct/alpha counts +
    * token runs, three stopword indexOf scans — same double arithmetic,
    * op for op, as [[qualityScore]].
    */
  def qualityScoreScala(text: String): Double = {
    var punct = 0
    var alpha = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':') punct += 1
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      i += 1
    }
    val len = text.length.toDouble
    val toks = tokenCountScala(text).toDouble
    val padded = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    val stop = (countNonOverlap(padded, " the ") + countNonOverlap(padded, " a ") +
      countNonOverlap(padded, " and ")).toDouble
    val lenScore = math.min(len / 500.0, 1.0)
    val punctScore = math.min(punct / math.max(toks, 1.0) * 5.0, 1.0)
    val alphaScore = alpha / math.max(len, 1.0)
    val stopScore = math.min(stop / math.max(toks, 1.0) * 10.0, 1.0)
    round6(lenScore * 0.3 + punctScore * 0.2 + alphaScore * 0.3 + stopScore * 0.2)
  }

  def qualityScoreFused(text: Column): Column = {
    val f = udf(qualityScoreScala _)
    f(text)
  }

  /** Low 64 bits of md5(s), matching DuckDB's `md5_number_lower`
    * (little-endian read of digest bytes 8..16) — the cross-engine
    * 64-bit string hash used wherever an oracle-checkable hash is
    * needed (SimHash token hashing, multimodal codec sniffing).
    */
  private val WsRunPattern = java.util.regex.Pattern.compile("\\s+")

  // one digest instance per thread: getInstance("MD5") is a provider
  // lookup + allocation, and simhash calls this once per TOKEN
  private val md5Digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def md5Lower64(s: String): Long = {
    val d = md5Digest.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 8, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
  }

  /** Gopher-style repetition signals, doc-local and shuffle-free:
    *  - `top2_frac`  — max over token 2-grams of occurrences × gram
    *    chars, over normalized doc chars (the "fraction of characters
    *    in the most repeated 2-gram" gate; the product-max makes the
    *    metric tie-free without picking a winner gram);
    *  - `dup3_frac`  — Σ over token 3-grams occurring more than once
    *    of occurrences × gram chars, over normalized doc chars (the
    *    "fraction of characters in duplicated n-grams" gate (n = 3 here: the synthetic corpus repeats 2–3-token spans, not 5); overlaps
    *    counted per occurrence, so both engines agree exactly).
    *
    * The metric is per-document, so the 100-TB plan is a PROJECTION:
    * per row, build the gram array (`transform`/`sequence`/`slice`),
    * `array_sort` it, and fold a run-length state over the sorted runs
    * with `aggregate` — O(k log k) doc-local work, zero exchanges,
    * where the unnest-and-groupBy formulation (which the DuckDB oracle
    * uses) would shuffle a gram stream several times the corpus size.
    * Numerators and denominators are exact integers; the one division
    * and round-6 are the q30-pinned parity convention.
    */
  def repetitionSignals(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    def grams(n: Int) =
      s"""CASE WHEN size(l) >= $n THEN array_sort(transform(
         |  sequence(0, size(l) - $n),
         |  i -> concat_ws(' ', slice(l, i + 1, $n))))
         |ELSE array() END""".stripMargin
    // max over runs of run-length × gram chars: within a run the
    // product grows monotonically, so the final GREATEST has seen every
    // run's full count × length
    val top2 =
      s"""aggregate(${grams(2)},
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
         |    'best', GREATEST(acc.best,
         |      IF(x <=> acc.prev, acc.run + 1L, 1L) * length(x))),
         |  acc -> acc.best)""".stripMargin
    // incremental duplicated-gram chars: a run contributes 2×len when
    // it reaches its 2nd occurrence and +len for each one past that
    val dup3 =
      s"""aggregate(${grams(3)},
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'dup', 0L),
         |  (acc, x) -> named_struct(
         |    'prev', x,
         |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
         |    'dup', acc.dup + CASE
         |      WHEN x <=> acc.prev AND acc.run = 1L THEN 2L * CAST(length(x) AS BIGINT)
         |      WHEN x <=> acc.prev THEN CAST(length(x) AS BIGINT)
         |      ELSE 0L END),
         |  acc -> acc.dup)""".stripMargin
    df.select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("l"))
      .withColumn("nl", length(concat_ws(" ", col("l"))).cast("long"))
      .select(col("doc_id"),
        when(col("nl") === 0L, lit(0.0))
          .otherwise(round(expr(top2) / col("nl"), 6)).as("top2_frac"),
        when(col("nl") === 0L, lit(0.0))
          .otherwise(round(expr(dup3) / col("nl"), 6)).as("dup3_frac"))
  }

  /** PII patterns shared by the scrubber and its oracle twin — kept to
    * the regex subset where Java's engine (Spark) and RE2 (DuckDB)
    * agree exactly: character classes, bounded repetition, `\b` word
    * boundaries (both define `\w` = [A-Za-z0-9_]), non-capturing
    * groups; no backrefs, no lookaround (RE2 has neither).
    */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val piiCard = "\\b[0-9]{13,19}\\b"

  /** PII scrubbing — the redaction pass every published corpus pipeline
    * (CCNet/Dolma/FineWeb lineage) runs before training: emails, IPv4
    * addresses, and long card-like digit runs are replaced with typed
    * placeholder tokens, and the count of each kind is kept for
    * downstream quality filters (a doc that is mostly PII gets
    * dropped, not just masked).
    *
    * Counts are measured independently on the ORIGINAL text (the
    * patterns cannot overlap: an IP's dot-separated runs are ≤ 3
    * digits so never card-length; emails contain letters) and the
    * replacement is sequential email → ip → card, so both engines
    * produce byte-identical scrubbed text. Per-document projection —
    * zero exchanges, whole-stage codegen; at 100 TB this is a pure
    * map over the corpus.
    */
  def scrubPii(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol).as("doc_id"),
      // cast("long"): size() is int; the count columns ship as BIGINT
      // so engine-independent consumers (and the DuckDB twin) agree on
      // the schema, not just the values
      size(regexp_extract_all(t, lit(piiEmail), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(piiIpv4), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(piiCard), lit(0))).cast("long").as("n_cards"),
      regexp_replace(regexp_replace(regexp_replace(t,
        piiEmail, "<EMAIL>"), piiIpv4, "<IP>"), piiCard, "<CARD>")
        .as("scrubbed"))
  }

  /** Normalized text for fingerprinting: lowercase, collapse whitespace. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (exact-dup key;
    * SQL-mirrorable).
    */
  def fingerprintMd5(text: Column): Column = md5(normalizedText(text).cast("binary"))

  /** Rolling polynomial hash (winnowing-style) over normalized text —
    * the shift-resistant fingerprint. Base-31 mod 2^61-1 over UTF-16
    * code units, window minimum sampling. Scala-side (used via UDF in
    * non-oracle queries and by tests).
    */
  def rollingFingerprint(text: String, window: Int = 16): Long = {
    val s = WsRunPattern.matcher(text.toLowerCase).replaceAll(" ").trim
    if (s.isEmpty) return 0L
    val p = (1L << 61) - 1
    val base = 31L
    // prefix hashes of all `window`-grams, then min-sample (winnowing)
    var h = 0L
    val grams = new Array[Long](math.max(1, s.length - window + 1))
    if (s.length <= window) {
      s.foreach { c => h = mulmod(h, base, p); h = (h + c) % p }
      return h
    }
    var pw = 1L
    (0 until window).foreach { i =>
      h = (mulmod(h, base, p) + s(i)) % p
      if (i < window - 1) pw = mulmod(pw, base, p)
    }
    grams(0) = h
    var i = window
    while (i < s.length) {
      h = (h - mulmod(s(i - window), pw, p) % p + p) % p
      h = (mulmod(h, base, p) + s(i)) % p
      grams(i - window + 1) = h
      i += 1
    }
    // fingerprint = xor of window minima (robust, order-free)
    grams.grouped(window).map(_.min).foldLeft(0L)(_ ^ _)
  }

  private def mulmod(a: Long, b: Long, m: Long): Long =
    java.math.BigInteger.valueOf(a).multiply(java.math.BigInteger.valueOf(b))
      .mod(java.math.BigInteger.valueOf(m)).longValueExact()
}
