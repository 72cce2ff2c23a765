package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/**
 * Text-analysis operators over document corpora — all pure
 * projections (codegen'd, no shuffle except the output sort), the
 * shapes a 100 TB training-data pipeline filters on.
 *
 * t01 language-ID and t02 quality use only integer/substring
 * arithmetic that DuckDB reproduces bit-for-bit, so every operator
 * here is hash-oracle-checked, including t04's custom rolling-hash
 * Catalyst expression (mirrored by a DuckDB `list_reduce`).
 */
object TextOps {

  private def norm(c: Column): Column = Dedup.normText(c)

  /** Occurrences of literal `w` in `c` via length arithmetic —
    * identical semantics in Spark and DuckDB (`replace` is literal,
    * not regex, in both). */
  private[operators] def occ(c: Column, w: String): Column =
    (length(c) - length(call_function("replace", c, lit(w)))) / w.length

  private[operators] def occSql(c: String, w: String): String =
    s"(length($c) - length(replace($c, '$w', ''))) / ${w.length}"

  // ---------------------------------------------------------- t01 langid

  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " of ", " and "),
    "de" -> Seq(" der ", " die ", " und "),
    "es" -> Seq(" el ", " los ", " y "),
    "fr" -> Seq(" le ", " la ", " et "))

  /** Stopword-count language ID: score per language = summed
    * occurrences of its marker words in the padded normalized text;
    * prediction = argmax with a fixed tie order (en, de, es, fr). */
  def langId(docs: DataFrame): DataFrame = {
    val padded = concat(lit(" "), norm(col("text")), lit(" "))
    val scores = langWords.map { case (lang, words) =>
      words.map(w => occ(padded, w)).reduce(_ + _).as(s"${lang}_score")
    }
    val withScores = docs.select((col("doc_id") +: col("lang") +: scores): _*)
    val en = col("en_score"); val de = col("de_score")
    val es = col("es_score"); val fr = col("fr_score")
    withScores.withColumn("pred_lang",
      when(en >= de && en >= es && en >= fr, "en")
        .when(de >= es && de >= fr, "de")
        .when(es >= fr, "es")
        .otherwise("fr"))
  }

  def t01LangId(spark: SparkSession, dir: String): DataFrame =
    langId(Tables.documents(spark, dir)).orderBy("doc_id")

  // --------------------------------------------------------- t02 quality

  /** Quality metrics: length, word count, stopword ratio, duplicate-
    * word ratio, uppercase ratio — the standard cheap pre-training
    * filters. */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val words = split(norm(t), " ")
    val nWords = size(words)
    val padded = concat(lit(" "), norm(t), lit(" "))
    docs.select(
      col("doc_id"),
      length(t).as("n_chars"),
      nWords.as("n_words"),
      round(occ(padded, " the ") / nWords, 4).as("stop_ratio"),
      round(lit(1.0) - size(array_distinct(words)).cast("double") / nWords, 4)
        .as("dup_word_ratio"),
      // empty text would divide by zero — a runtime ERROR under
      // Spark's default ANSI mode, not NaN; null it explicitly
      round(when(length(t) > 0,
        regexp_count(t, lit("[A-Z]")).cast("double") / length(t)), 4)
        .as("upper_ratio"))
  }

  def t02Quality(spark: SparkSession, dir: String): DataFrame =
    quality(Tables.documents(spark, dir)).orderBy("doc_id")

  // ---------------------------------------------------------- t03 tokens

  /** Token counts: whitespace tokens, alpha / numeric / other regex
    * tokens (a BPE-ish pre-tokenization), chars per token. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val t = col("text")
    val ws = size(split(trim(t), "\\s+"))
    docs.select(
      col("doc_id"),
      ws.as("ws_tokens"),
      regexp_count(lower(t), lit("[a-z]+")).as("alpha_tokens"),
      regexp_count(t, lit("[0-9]+")).as("num_tokens"),
      regexp_count(t, lit("[^a-zA-Z0-9\\s]")).as("other_tokens"),
      round(length(t).cast("double") / ws, 4).as("chars_per_token"))
  }

  def t03Tokens(spark: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.documents(spark, dir)).orderBy("doc_id")

  /**
   * Flesch reading-ease quality signal — the readability band a
   * curriculum / quality-mix pipeline filters on: 206.835 −
   * 1.015·(words/sentences) − 84.6·(syllables/words), with
   * deterministic regex proxies (sentences = terminal-punctuation
   * runs, floor 1; syllables = vowel-group runs — the standard
   * heuristic, identical under Java regex and RE2). Pure codegen'd
   * projection, no shuffle; the band label is decided on the
   * 4-dp-ROUNDED score in both engines (the n05 boundary rule).
   */
  def readability(docs: DataFrame): DataFrame = {
    val t = col("text")
    val words = greatest(size(split(trim(t), "\\s+")), lit(1)).cast("double")
    val sents = greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("double")
    val sylls = greatest(regexp_count(lower(t), lit("[aeiouy]+")), lit(1)).cast("double")
    val score = round(lit(206.835) - lit(1.015) * (words / sents)
      - lit(84.6) * (sylls / words), 4)
    docs.select(col("doc_id"),
      words.cast("long").as("n_words"), sents.cast("long").as("n_sentences"),
      sylls.cast("long").as("n_syllables"), score.as("flesch"),
      when(score >= 70, "easy").when(score >= 50, "medium")
        .when(score >= 30, "hard").otherwise("very_hard").as("band"))
  }

  def t17Readability(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.documents(spark, dir)).orderBy("doc_id")

  // ------------------------------------------------ t19 gopher gate

  /** The eight Gopher stop words whose presence rule 7 counts. */
  private[operators] val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * t19: the Gopher DOC-LEVEL quality GATE (Rae et al. 2021, app. A1)
   * — where t02/t14 report raw signals, this is the published rule
   * set as a keep/drop DECISION with per-rule evidence columns, the
   * operator a filtering pipeline composes directly:
   *   r1: 50 ≤ words ≤ 100 000        r2: 3 ≤ mean word length ≤ 10
   *   r3: symbol-to-word ratio (# or …) < 0.1
   *   r4: < 90% of lines bullet-led   r5: < 30% of lines ellipsis-ended
   *   r6: > 80% of words contain an alphabetic character
   *   r7: ≥ 2 distinct Gopher stop words present (space-delimited
   *       token presence on the normalized text — punctuation-attached
   *       occurrences don't count, identically in both engines)
   * Pure codegen'd projection — ONE corpus scan, no shuffle, so the
   * 100 TB cost is the read itself. Every ratio is decided on its
   * 4-dp-ROUNDED value (the n05 boundary rule) and lines come from
   * the t14 deterministic re-lining, so the keep bit is
   * hash-reproducible cross-engine; empty text short-circuits rule 1
   * to false before any ratio divides.
   */
  def gopherGate(docs: DataFrame, lineWords: Int = 12): DataFrame = {
    // per-doc kernel (the t20 repStatsKernel lesson): every statistic
    // is a pure function of ONE document, and the declarative form
    // re-scanned the text ~10× (two regex splits, a relining regex,
    // per-line rlikes, the normalize) — the kernel makes one pass
    // over each derived form. The declarative plan is kept as
    // [[gopherGateDeclarative]], spec-pinned equal row-for-row; the
    // ratio/threshold assembly below is the SAME Column code for
    // both, so the 4-dp boundary rule cannot diverge.
    val kudf = udf(gopherStatsKernel(lineWords))
    gopherAssemble(docs.select(col("doc_id"), kudf(col("text")).as("st"))
      .select(col("doc_id"), col("st.nw").as("nw"),
        col("st.nonws").as("nonws"), col("st.symbols").as("symbols"),
        col("st.alphaw").as("alphaw"), col("st.nlines").as("nlines"),
        col("st.bulletl").as("bulletl"), col("st.ellipl").as("ellipl"),
        col("st.stophits").as("stophits")))
  }

  /** The original expression-graph form of [[gopherGate]] — retained
    * as the kernel's semantic pin (LlmOpsSpec asserts row-for-row
    * equality on the real corpus + edge docs). */
  private[graft] def gopherGateDeclarative(docs: DataFrame,
      lineWords: Int = 12): DataFrame = {
    val t = col("text")
    val nw = when(length(trim(t)) === 0, 0.0)
      .otherwise(size(split(trim(t), "\\s+")).cast("double"))
    val nonWs = length(regexp_replace(t, "\\s", "")).cast("double")
    val symbols = occ(t, "#") + occ(t, "...")
    val alphaW = size(filter(split(trim(t), "\\s+"),
      w => w.rlike("[A-Za-z]"))).cast("double")
    val lines = split(relined(lineWords), "\n")
    val nLines = size(lines).cast("double")
    val bulletL = size(filter(lines, l => trim(l).rlike("^[-*] "))).cast("double")
    val ellipL = size(filter(lines,
      l => substring(trim(l), -3, 3) === "...")).cast("double")
    val padded = concat(lit(" "), norm(t), lit(" "))
    val stopHits = gopherStops.map(w =>
      when(occ(padded, s" $w ") > 0, 1).otherwise(0)).reduce(_ + _)
    gopherAssemble(docs.select(col("doc_id"), nw.as("nw"),
      nonWs.as("nonws"), symbols.as("symbols"), alphaW.as("alphaw"),
      nLines.as("nlines"), bulletL.as("bulletl"), ellipL.as("ellipl"),
      stopHits.as("stophits")))
  }

  /** Ratio + threshold assembly shared verbatim by the kernel and
    * declarative paths — every rule decides on its 4-dp-ROUNDED
    * value (the n05 boundary rule). */
  private def gopherAssemble(s: DataFrame): DataFrame = {
    val nw = col("nw"); val nLines = col("nlines")
    val stopHits = col("stophits")
    val meanW = when(nw > 0, round(col("nonws") / nw, 4) + lit(0.0))
    val symR = when(nw > 0, round(col("symbols") / nw, 4) + lit(0.0))
    val alpR = when(nw > 0, round(col("alphaw") / nw, 4) + lit(0.0))
    val bulR = round(col("bulletl") / nLines, 4) + lit(0.0)
    val ellR = round(col("ellipl") / nLines, 4) + lit(0.0)
    val rules = Seq(
      nw >= 50 && nw <= 100000, meanW >= 3 && meanW <= 10,
      symR < 0.1, bulR < 0.9, ellR < 0.3, alpR > 0.8, stopHits >= 2)
    // n_failed grades HOW far a doc is from passing (null rule on
    // empty text counts failed); keep is the published all-rules AND
    val nFailed = rules.map(r =>
      when(coalesce(r, lit(false)), 0).otherwise(1)).reduce(_ + _)
    s.select(col("doc_id"), nw.cast("long").as("n_words"),
      meanW.as("mean_wlen"), symR.as("symbol_ratio"),
      bulR.as("bullet_frac"), ellR.as("ellipsis_frac"),
      alpR.as("alpha_frac"), stopHits.cast("long").as("stop_hits"),
      nFailed.cast("long").as("n_failed"),
      rules.reduce(_ && _).as("keep"))
  }

  /** Kernel emissions: all defined for any non-null text (null text →
    * null struct → null stats, the declarative null propagation). */
  private[graft] final case class GopherStats(
      nw: Double, nonws: Double, symbols: Double, alphaw: Double,
      nlines: Double, bulletl: Double, ellipl: Double, stophits: Int)

  /** Per-document twin of the declarative t19 stats (see
    * [[gopherGate]]); expression-twin notes: Spark `trim` is
    * ASCII-space-only ([[spaceTrim]]); `split(x, re)` is
    * `x.split(re, -1)` on the same regex engine; `rlike` is FIND;
    * `occ` counts non-overlapping left-to-right literal occurrences
    * (the replace-length arithmetic); `substring(x, -3, 3) = "..."`
    * reduces to endsWith (dots are single code units, shorter
    * strings can never equal it); normText is
    * lower(regexp_replace(text, "\\s+", " ")) with the same
    * default-locale toLowerCase. */
  private[graft] def gopherStatsKernel(
      lineWords: Int): String => GopherStats = {
    val wsOne = java.util.regex.Pattern.compile("\\s")
    val wsPlus = java.util.regex.Pattern.compile("\\s+")
    val alphaRe = java.util.regex.Pattern.compile("[A-Za-z]")
    val bulletRe = java.util.regex.Pattern.compile("^[-*] ")
    val lineRe = java.util.regex.Pattern.compile(
      "(\\S+" + "\\s+\\S+" * (lineWords - 1) + ")\\s+")
    val stops = gopherStops
    def occCount(s: String, w: String): Double = {
      var c = 0
      var i = s.indexOf(w)
      while (i >= 0) { c += 1; i = s.indexOf(w, i + w.length) }
      c.toDouble
    }
    val kernel: String => GopherStats = (text: String) => {
      if (text == null) null
      else {
        val trimmed = spaceTrim(text)
        val words = wsPlus.split(trimmed, -1)
        val nw = if (trimmed.isEmpty) 0.0 else words.length.toDouble
        val nonws = cpLen(wsOne.matcher(text).replaceAll("")).toDouble
        val symbols = occCount(text, "#") + occCount(text, "...")
        var alphaw = 0
        var i = 0
        while (i < words.length) {
          if (alphaRe.matcher(words(i)).find()) alphaw += 1
          i += 1
        }
        val lines = lineRe.matcher(text).replaceAll("$1\n").split("\n", -1)
        var bulletl = 0
        var ellipl = 0
        i = 0
        while (i < lines.length) {
          val tl = spaceTrim(lines(i))
          if (bulletRe.matcher(tl).find()) bulletl += 1
          if (tl.endsWith("...")) ellipl += 1
          i += 1
        }
        val padded = " " + wsPlus.matcher(text).replaceAll(" ").toLowerCase() + " "
        var stophits = 0
        var j = 0
        while (j < stops.length) {
          if (padded.contains(" " + stops(j) + " ")) stophits += 1
          j += 1
        }
        GopherStats(nw, nonws, symbols, alphaw.toDouble,
          lines.length.toDouble, bulletl.toDouble, ellipl.toDouble,
          stophits)
      }
    }
    kernel
  }

  def t19GopherGate(spark: SparkSession, dir: String): DataFrame =
    gopherGate(Tables.documents(spark, dir)).orderBy("doc_id")

  // ------------------------------------------- t20 repetition gate

  /** Published Gopher repetition thresholds (Rae et al. 2021,
    * appendix A1, repetition table): a document is KEPT while each
    * fraction stays ≤ its threshold. Shared with the generated oracle
    * SQL — change in lockstep. */
  private[graft] val topGramThr = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  private[graft] val dupGramThr =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
  private[graft] val lineParaThr = Seq(
    "dup_line_frac" -> 0.30, "dup_line_char_frac" -> 0.20,
    "dup_para_frac" -> 0.30, "dup_para_char_frac" -> 0.20)

  /**
   * t20: the FULL Gopher repetition rule set (Rae et al. 2021, app.
   * A1) as a keep/drop DECISION — the companion gate to t19's
   * doc-level quality rules, covering the repetition table t08/t14
   * only sample: duplicate line/paragraph fraction (≤ 0.30) and
   * duplicate line/paragraph CHARACTER fraction (≤ 0.20) over the t14
   * deterministic re-lining, top-{2,3,4}-gram character fraction
   * (≤ 0.20/0.18/0.16) and duplicate-{5..10}-gram character fraction
   * (≤ 0.15/0.14/0.13/0.12/0.11/0.10), plus `n_failed`.
   *
   * Definitional choices (documented because the paper's prose leaves
   * them open; every rule decides on its 4-dp-ROUNDED value — the
   * n05/t19 boundary rule):
   *  - duplicate-character fractions count characters in occurrences
   *    BEYOND the first of each repeated line/gram ((c−1)·len — the
   *    "excess" convention of the public RedPajama-v2 signals), over
   *    total line chars (lines) / normalized doc chars (grams), capped
   *    at 1 (overlapping gram occurrences can overshoot);
   *  - the top-n-gram is the max-count gram with ties broken to the
   *    LONGEST (integer compare — no cross-engine collation risk); a
   *    top gram occurring ONCE contributes 0 chars (not repetition);
   *  - a rule with no evidence (doc shorter than n words, empty text)
   *    PASSES — unlike t19's coverage rules, absent repetition is a
   *    clean pass, so short docs aren't dropped for being short.
   *
   * Shape: every statistic here is a pure function of ONE document —
   * the grams, lines and paragraphs of a doc all originate in its
   * single source row — so the operator runs as a per-row kernel
   * (`repStatsKernel`): one corpus scan, ZERO shuffles, nothing
   * exploded (the r17 plan audit measured the previous tagged-gram
   * explode + (doc, n, gram) count shuffle as the sweep's heaviest
   * line — 9× the word count in generated rows and the gram strings
   * through the exchange, all to regroup rows that were partition-
   * local to begin with). The kernel is the expression graph's exact
   * twin — same normText/relined regexes, Spark's space-only trim,
   * code-point lengths, concat_ws empty-string behavior, max-count/
   * longest-gram tie-break — and the old declarative plan is kept as
   * [[repetitionGateDeclarative]] with a spec pinning the two equal
   * row-for-row; the final fraction/threshold assembly is the SAME
   * Column code for both. 100 TB: embarrassingly parallel, scales by
   * adding executors with no exchange at all.
   */
  def repetitionGate(docs: DataFrame, lineWords: Int = 3,
      paraWords: Int = 12): DataFrame = {
    val kudf = udf(repStatsKernel(lineWords, paraWords))
    val joined = docs.select(col("doc_id"), kudf(col("text")).as("st"))
      .select(col("doc_id") +: (
        "tot" +: RepStatFields).map(f => col(s"st.$f").as(f)): _*)
    repGateAssemble(joined)
  }

  private[graft] val RepStatFields: Seq[String] = Seq(
    "l_n", "l_d", "l_dupch", "l_totch", "p_n", "p_d", "p_dupch", "p_totch",
    "top2c", "top3c", "top4c",
    "dup5c", "dup6c", "dup7c", "dup8c", "dup9c", "dup10c")

  /** Kernel output: the same intermediate stats the declarative
    * plan's lstats/gstats joins produce, None where a left join would
    * have yielded null (no non-empty lines / no n-grams of that n). */
  private[graft] final case class RepStats(
      tot: Option[Double],
      l_n: Option[Long], l_d: Option[Long],
      l_dupch: Option[Long], l_totch: Option[Long],
      p_n: Option[Long], p_d: Option[Long],
      p_dupch: Option[Long], p_totch: Option[Long],
      top2c: Option[Long], top3c: Option[Long], top4c: Option[Long],
      dup5c: Option[Long], dup6c: Option[Long], dup7c: Option[Long],
      dup8c: Option[Long], dup9c: Option[Long], dup10c: Option[Long])

  /** Spark's `trim`: ASCII space (0x20) ONLY — Java's String.trim
    * strips all controls ≤ 0x20 and would diverge on tab-bearing
    * lines. */
  private def spaceTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Spark `length`: CODE POINTS (UTF8String.numChars), not UTF-16
    * code units. */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Per-document twin of the declarative t20 stats plan (see
    * [[repetitionGate]]). java.util.regex.Pattern is Serializable, so
    * the compiled relining patterns ride the closure; a local
    * function VAL (not a method reference) keeps the enclosing module
    * out of it. */
  private[graft] def repStatsKernel(
      lineWords: Int, paraWords: Int): String => RepStats = {
    val ns: Seq[Int] = topGramThr.map(_._1) ++ dupGramThr.map(_._1)
    val wsRe = java.util.regex.Pattern.compile("\\s+")
    def relineRe(n: Int) = java.util.regex.Pattern.compile(
      "(\\S+" + "\\s+\\S+" * (n - 1) + ")\\s+")
    val lineRe = relineRe(lineWords)
    val paraRe = relineRe(paraWords)
    val none = RepStats(None, None, None, None, None, None, None, None,
      None, None, None, None, None, None, None, None, None, None)
    val kernel: String => RepStats = (text: String) => {
      if (text == null) none
      else {
        // normText twin: lower(regexp_replace(text, "\\s+", " ")).
        // UTF8String.toLowerCase falls back to String.toLowerCase()
        // (default locale) off the ASCII fast path — same call here.
        val nt = wsRe.matcher(text).replaceAll(" ").toLowerCase()
        val w = nt.split(" ", -1)
        // per-n gram stats: (topNc for n ∈ {2,3,4}) / (dupNc for
        // n ∈ {5..10}); None when the doc has no n-grams of that n
        val perN = ns.map { n =>
          if (w.length < n) None
          else {
            val counts = new java.util.HashMap[String, java.lang.Long]()
            var i = 0
            while (i + n <= w.length) {
              val sb = new java.lang.StringBuilder()
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(w(i + j))
                j += 1
              }
              val g = sb.toString
              val prev = counts.get(g)
              counts.put(g, if (prev == null) 1L else prev.longValue() + 1L)
              i += 1
            }
            var mc = 0L
            var wlen = 0L
            var dupch = 0L
            counts.forEach { (g, cB) =>
              val c = cB.longValue()
              val len = cpLen(g)
              if (c > mc) { mc = c; wlen = len }
              else if (c == mc && len > wlen) wlen = len
              if (c > 1) dupch += (c - 1) * len
            }
            Some(if (n <= 4) { if (mc > 1) mc * wlen else 0L } else dupch)
          }
        }
        // line/paragraph stats on the RAW text (the declarative plan
        // relines `text`, not the normalized string)
        def lvl(re: java.util.regex.Pattern)
            : (Option[Long], Option[Long], Option[Long], Option[Long]) = {
          val parts = re.matcher(text).replaceAll("$1\n").split("\n", -1)
          val counts = new java.util.HashMap[String, java.lang.Long]()
          parts.foreach { p =>
            val l = spaceTrim(p)
            if (l.nonEmpty) {
              val prev = counts.get(l)
              counts.put(l, if (prev == null) 1L else prev.longValue() + 1L)
            }
          }
          if (counts.isEmpty) (None, None, None, None)
          else {
            var n = 0L
            var d = 0L
            var dupch = 0L
            var totch = 0L
            counts.forEach { (l, cB) =>
              val c = cB.longValue()
              val len = cpLen(l)
              n += c; d += 1; dupch += (c - 1) * len; totch += c * len
            }
            (Some(n), Some(d), Some(dupch), Some(totch))
          }
        }
        val (ln, ld, ldu, lto) = lvl(lineRe)
        val (pn, pd, pdu, pto) = lvl(paraRe)
        RepStats(Some(cpLen(nt).toDouble),
          ln, ld, ldu, lto, pn, pd, pdu, pto,
          perN(0), perN(1), perN(2),
          perN(3), perN(4), perN(5), perN(6), perN(7), perN(8))
      }
    }
    kernel
  }

  /** The ORIGINAL declarative t20 plan (tagged-gram explode + count
    * shuffle + argmax self-join), retained as the kernel's
    * cross-check twin — LlmOpsSpec pins kernel ≡ declarative
    * row-for-row on real corpus data. */
  private[graft] def repetitionGateDeclarative(docs: DataFrame, lineWords: Int = 3,
      paraWords: Int = 12): DataFrame = {
    val ns = topGramThr.map(_._1) ++ dupGramThr.map(_._1)
    val w = col("__w")
    def grams(n: Int): Column =
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
    val base = docs
      .withColumn("__nt", Dedup.normText(col("text")))
      .withColumn("__w", split(col("__nt"), " "))
    val tagged = base.select(col("doc_id"),
        explode(concat(ns.map(n => transform(grams(n), g =>
          struct(lit(n).as("n"), g.as("g")))): _*)).as("e"))
      .select(col("doc_id"), col("e.n").as("n"), col("e.g").as("g"))
    val cnt = tagged.groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
    val mx = cnt.groupBy("doc_id", "n").agg(
      max("c").as("mc"),
      sum(when(col("c") > 1, (col("c") - 1) * length(col("g")))
        .otherwise(0L)).as("dupch"))
    val win = cnt.join(mx.select("doc_id", "n", "mc"), Seq("doc_id", "n"))
      .filter(col("c") === col("mc"))
      .groupBy("doc_id", "n").agg(max(length(col("g"))).as("wlen"))
    // a top gram occurring ONCE is not repetition: its char count is
    // 0, so singleton-top docs pass instead of failing on one gram's
    // length (matters below ~45 words, where one n-gram can exceed
    // the threshold share of a short doc)
    val gAggs = topGramThr.map { case (n, _) =>
      max(when(col("n") === n,
        when(col("mc") > 1, col("mc") * col("wlen")).otherwise(0L)))
        .as(s"top${n}c")
    } ++ dupGramThr.map { case (n, _) =>
      max(when(col("n") === n, col("dupch"))).as(s"dup${n}c")
    }
    val gstats = mx.join(win, Seq("doc_id", "n"))
      .groupBy("doc_id").agg(gAggs.head, gAggs.tail: _*)
    // lines + paragraphs: t14's two-level tagged explode, widened
    // with the paragraph character sums the gate needs
    def seg(n: Int, lvl: String) =
      transform(split(relined(n), "\n"), l => struct(lit(lvl).as("lvl"), trim(l).as("l")))
    val lines = docs.select(col("doc_id"),
        explode(concat(seg(lineWords, "l"), seg(paraWords, "p"))).as("e"))
      .select(col("doc_id"), col("e.lvl").as("lvl"), col("e.l").as("l"))
      .filter(length(col("l")) > 0)
    val perLine = lines.groupBy("doc_id", "lvl", "l").agg(count(lit(1)).as("cnt"))
    def lv(tag: String)(c: Column): Column = when(col("lvl") === tag, c)
    val lstats = perLine.groupBy("doc_id").agg(
      sum(lv("l")(col("cnt"))).as("l_n"),
      count(lv("l")(lit(1))).as("l_d"),
      sum(lv("l")((col("cnt") - 1) * length(col("l")))).as("l_dupch"),
      sum(lv("l")(col("cnt") * length(col("l")))).as("l_totch"),
      sum(lv("p")(col("cnt"))).as("p_n"),
      count(lv("p")(lit(1))).as("p_d"),
      sum(lv("p")((col("cnt") - 1) * length(col("l")))).as("p_dupch"),
      sum(lv("p")(col("cnt") * length(col("l")))).as("p_totch"))
    val joined = base.select(col("doc_id"),
        length(col("__nt")).cast("double").as("tot"))
      .join(lstats, Seq("doc_id"), "left")
      .join(gstats, Seq("doc_id"), "left")
    repGateAssemble(joined)
  }

  /** Shared t20 fraction/threshold assembly over the intermediate
    * stats columns (doc_id, tot, [[RepStatFields]]) — the SAME Column
    * code for the kernel and declarative paths, so rounding and null
    * (no-evidence pass) semantics cannot diverge between them. */
  private def repGateAssemble(joined: DataFrame): DataFrame = {
    // least/greatest IGNORE nulls (Postgres semantics, both engines):
    // an absent numerator must stay null (no-evidence pass), not
    // collapse to least(1.0, null) = 1.0
    def ratio(num: Column, den: Column): Column =
      Norm.r4(when(den > 0 && num.isNotNull,
        least(lit(1.0), num.cast("double") / den)))
    val fracs: Seq[(String, Column, Double)] = Seq(
      ("dup_line_frac", ratio(col("l_n") - col("l_d"), col("l_n")), 0.30),
      ("dup_line_char_frac", ratio(col("l_dupch"), col("l_totch")), 0.20),
      ("dup_para_frac", ratio(col("p_n") - col("p_d"), col("p_n")), 0.30),
      ("dup_para_char_frac", ratio(col("p_dupch"), col("p_totch")), 0.20)) ++
      topGramThr.map { case (n, thr) =>
        (s"top_${n}gram_char_frac", ratio(col(s"top${n}c"), col("tot")), thr)
      } ++
      dupGramThr.map { case (n, thr) =>
        (s"dup_${n}gram_char_frac", ratio(col(s"dup${n}c"), col("tot")), thr)
      }
    val rules = fracs.map { case (_, c, thr) => c <= thr }
    val nFailed = rules.map(r =>
      when(coalesce(r, lit(true)), 0).otherwise(1)).reduce(_ + _)
    joined.select(col("doc_id") +:
      fracs.map { case (nm, c, _) => c.as(nm) } :+
      nFailed.cast("long").as("n_failed") :+
      rules.map(r => coalesce(r, lit(true))).reduce(_ && _).as("keep"): _*)
  }

  def t20RepetitionGate(spark: SparkSession, dir: String): DataFrame =
    repetitionGate(Tables.documents(spark, dir)).orderBy("doc_id")

  // ------------------------------------------------------- t13 BPE

  /** BPE training size DEFAULTS — shared with the generated oracle
    * SQL, so change them in lockstep. Training reads only the TOP-K
    * rows of the word-frequency table (bounded driver state, the
    * k-means-codebook altitude): the merge table is model state, the
    * corpus never leaves the executors. Driver memory is bounded by
    * trainWords × (avg word length × 2 B + object overhead) — 1e6
    * train words ≈ tens of MB; nMerges costs nMerges passes over
    * those same rows, never over the corpus. Corpus-scale runs
    * override both per session via `spark.graft.bpe.merges` /
    * `spark.graft.bpe.trainWords` (t13BpeTokens reads them); the
    * registered query keeps the defaults because the generated
    * oracle bakes the same constants. */
  private[graft] val BpeMerges = 20
  private[graft] val BpeTrainWords = 500

  /** Apply ONE merge (a,b)→ab to a sentinel-spaced symbol string
    * (" t h e ") by repeated LEFTMOST replacement — exact greedy BPE
    * application semantics (each replacement rescans from the start,
    * so earlier merges can enable later ones, and overlapping
    * same-symbol runs pair up left-to-right). The DuckDB oracle
    * replays precisely this loop as a recursive CTE. */
  private[graft] def bpeApplyMerge(s0: String, a: String, b: String): String = {
    val pat = " " + a + " " + b + " "
    val rep = " " + a + b + " "
    var s = s0
    var idx = s.indexOf(pat)
    while (idx >= 0) {
      s = s.substring(0, idx) + rep + s.substring(idx + pat.length)
      idx = s.indexOf(pat)
    }
    s
  }

  /** Initial segmentation, one symbol per CODE POINT — `w.map` over
    * chars would split supplementary-plane characters into surrogate
    * halves, while the DuckDB oracle's string functions index by code
    * point; segmenting by code point keeps engine and oracle aligned
    * on any corpus, not just ASCII/BMP. */
  private[graft] def bpeSeg(w: String): String = {
    val sb = new java.lang.StringBuilder(" ")
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Code-point lexicographic compare — the same order as UTF-8
    * binary (DuckDB's collation); plain String.compareTo is UTF-16
    * code-UNIT order, which ranks supplementary characters BELOW
    * some BMP ones and would break cross-engine tie-break parity. */
  private def cpCompare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(a.length, b.length)
  }

  /** Train `nMerges` BPE merges on a (word, freq) table — the classic
    * Sennrich algorithm: count adjacent symbol pairs weighted by word
    * frequency, merge the argmax (ties broken on the pair string so
    * the result is deterministic), repeat. Runs driver-side over the
    * top-K word rows ONLY — bounded model state, like collecting
    * k-means centroids. */
  private[graft] def bpeTrain(
      wf: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var seg = wf.map { case (w, f) => (bpeSeg(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      seg.foreach { case (s, f) =>
        val toks = s.trim.split(" ")
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // argmax count, ties on the pair string in CODE-POINT order
        val (a, b) = counts.foldLeft(Option.empty[((String, String), Long)]) {
          case (best, cur) =>
            val better = best.forall { b0 =>
              cur._2 > b0._2 || (cur._2 == b0._2 &&
                cpCompare(cur._1._1 + " " + cur._1._2, b0._1._1 + " " + b0._1._2) < 0)
            }
            if (better) Some(cur) else best
        }.get._1
        merges += ((a, b))
        seg = seg.map { case (s, f) => (bpeApplyMerge(s, a, b), f) }
      }
      r += 1
    }
    merges.toSeq
  }

  /**
   * t13: REAL subword tokenization — corpus-trained byte-pair
   * encoding (Sennrich et al. 2016, the public algorithm), replacing
   * nothing: t03's whitespace/regex counts stay as the cheap
   * projection; this is the trained-tokenizer path a training-data
   * pipeline actually budgets tokens with.
   *
   * Scale shape: ONE aggregation builds the distinct-word frequency
   * table; training collects only its top-K rows (bounded model
   * state); the learned merge table ships to executors inside the
   * tokenize closure; tokenization runs ONCE PER DISTINCT WORD (not
   * per occurrence — at 100 TB the distinct-word table is orders of
   * magnitude smaller than the token stream), then a word-keyed
   * shuffle join prices each occurrence and a per-doc aggregate
   * sums. No driver loop touches row-proportional data.
   */
  def bpeTokens(docs: DataFrame, nMerges: Int = BpeMerges,
      trainWords: Int = BpeTrainWords): DataFrame = {
    val spark = docs.sparkSession
    val words = docs.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val wf = words.groupBy("w").agg(count(lit(1)).as("freq"))
    val top = wf.orderBy(col("freq").desc, col("w").asc).limit(trainWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = bpeTrain(top, nMerges)
    val tokenize = udf((w: String) => {
      var s = bpeSeg(w)
      merges.foreach { case (a, b) => s = bpeApplyMerge(s, a, b) }
      s.trim.split(" ").length
    })
    val wordToks = wf.select(col("w"), tokenize(col("w")).as("wt"))
    val agg = words.join(wordToks, "w")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum("wt").cast("long").as("n_tokens"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 4).as("avg_word_tokens"))
  }

  def t13BpeTokens(spark: SparkSession, dir: String): DataFrame =
    bpeTokens(Tables.documents(spark, dir),
      nMerges = spark.conf.get("spark.graft.bpe.merges", BpeMerges.toString).toInt,
      trainWords = spark.conf.get("spark.graft.bpe.trainWords", BpeTrainWords.toString).toInt)
      .orderBy("doc_id")

  /**
   * t24: TOKENIZER FERTILITY BY LANGUAGE — the standard tokenizer-QC
   * table (how many subword tokens a word of each language costs, and
   * how many bytes ride in each token): a tokenizer trained on a
   * skewed mixture quietly taxes the under-represented languages with
   * 2–4× the tokens per word, which is 2–4× the training/inference
   * cost and context budget for the same text — THIS table is how
   * that's caught before training. Fertility = Σtokens/Σwords and
   * bytes-per-token = Σtext-bytes/Σtokens per lang, on t13's trained
   * BPE segmentation (same merges, same word-frequency table).
   *
   * Scale shape: everything heavy is t13's — one word explode +
   * frequency aggregate, the vocab-bounded driver training, the
   * word-level (not doc-level) segmentation join — and the fertility
   * aggregate itself is map-side combined to |langs| rows. Wordless
   * docs carry no signal and are excluded (matching the inner join
   * on the segmented-word table).
   */
  def tokenizerFertility(docs: DataFrame, nMerges: Int = BpeMerges,
      trainWords: Int = BpeTrainWords): DataFrame = {
    val perDoc = bpeTokens(docs, nMerges, trainWords).filter(col("n_words") > 0)
    docs.select(col("doc_id"), col("lang"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .join(perDoc, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"), sum("n_bytes").as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        round(col("n_tokens") / col("n_words"), 4).as("fertility"),
        round(col("n_bytes") / col("n_tokens"), 4).as("bytes_per_token"))
      .orderBy("lang")
  }

  def t24TokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    tokenizerFertility(Tables.documents(spark, dir),
      nMerges = spark.conf.get("spark.graft.bpe.merges", BpeMerges.toString).toInt,
      trainWords = spark.conf.get("spark.graft.bpe.trainWords", BpeTrainWords.toString).toInt)

  // -------------------------------------------------- t14 line stats

  /** Chunk running text into pseudo-lines of `n` words by replacing
    * every n-th inter-word gap with a newline — a deterministic
    * re-lining both engines compute identically (global regex replace
    * is non-overlapping left-to-right in Java regex and RE2 alike).
    * Used because the synthetic corpus carries no newlines; on real
    * data pass the text through unchanged and split on its own \n. */
  private[graft] def relined(n: Int): Column = regexp_replace(col("text"),
    "(\\S+" + "\\s+\\S+" * (n - 1) + ")\\s+", "$1\n")

  private[operators] def relinedSql(n: Int): String = {
    val pat = """(\S+""" + """\s+\S+""" * (n - 1) + """)\s+"""
    s"""regexp_replace(text, '$pat', '\\1' || chr(10), 'g')"""
  }

  /**
   * t14: Gopher/C4-style LINE-level repetition and format filters —
   * the standard public pre-training filter set t08's n-gram
   * repetition doesn't cover: fraction of duplicate lines, fraction
   * of CHARACTERS in duplicate lines (Gopher counts both), duplicate-
   * paragraph fraction, and the terminal-punctuation line ratio (C4
   * keeps only lines ending in terminal punctuation).
   *
   * Shape (the t12 altitude): ONE corpus scan explodes BOTH
   * granularities as level-tagged rows (round 8 ran the line and
   * paragraph pipelines as two separate scans — the plan audit showed
   * the corpus read twice; concat-before-explode halves the IO), then
   * the two-level aggregate: per-(doc, level, line) counts collapse
   * map-side, then one per-doc aggregate with conditional sums per
   * level. Nothing is row-proportional on the driver and every stage
   * is a hash aggregate — no join at all.
   */
  def lineStats(docs: DataFrame, lineWords: Int = 3, paraWords: Int = 12): DataFrame = {
    def seg(n: Int, lvl: String) =
      transform(split(relined(n), "\n"), l => struct(lit(lvl).as("lvl"), trim(l).as("l")))
    val lines = docs.select(col("doc_id"),
        explode(concat(seg(lineWords, "l"), seg(paraWords, "p"))).as("e"))
      .select(col("doc_id"), col("e.lvl").as("lvl"), col("e.l").as("l"))
      .filter(length(col("l")) > 0)
    val perLine = lines.groupBy("doc_id", "lvl", "l").agg(count(lit(1)).as("cnt"))
    def lv(tag: String)(c: Column): Column = when(col("lvl") === tag, c)
    val perDoc = perLine.groupBy("doc_id").agg(
      sum(lv("l")(col("cnt"))).cast("long").as("l_n"),
      count(lv("l")(lit(1))).as("l_distinct"),
      sum(lv("l")((col("cnt") - 1) * length(col("l")))).as("l_dup_chars"),
      sum(lv("l")(col("cnt") * length(col("l")))).as("l_tot_chars"),
      sum(lv("l")(when(substring(col("l"), -1, 1).isin(".", "!", "?", "\""), col("cnt"))
        .otherwise(0L))).cast("long").as("l_punct"),
      sum(lv("p")(col("cnt"))).cast("long").as("p_n"),
      count(lv("p")(lit(1))).as("p_distinct"))
    perDoc.select(
      col("doc_id"),
      col("l_n").as("n_lines"),
      round((col("l_n") - col("l_distinct")).cast("double") / col("l_n"), 4)
        .as("dup_line_frac"),
      round(col("l_dup_chars").cast("double") / col("l_tot_chars"), 4)
        .as("dup_line_char_frac"),
      round(col("l_punct").cast("double") / col("l_n"), 4).as("term_punct_frac"),
      round((col("p_n") - col("p_distinct")).cast("double") / col("p_n"), 4)
        .as("dup_para_frac"))
  }

  def t14LineStats(spark: SparkSession, dir: String): DataFrame =
    lineStats(Tables.documents(spark, dir)).orderBy("doc_id")

  // ----------------------------------------------------- t04 fingerprint

  /** Document fingerprints: md5 of the normalized text plus the
    * codegen'd polynomial rolling hash ([[graft.functions.RollingHash]]). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(norm(col("text"))).as("fp_md5"),
      GraftFunctions.rollingHash(norm(col("text"))).as("roll_hash"))

  /** The t04/t16 DuckDB oracles recompute RollingHash with per-CHARACTER
    * ord() (code points) while the Spark expression hashes UTF-8 BYTES —
    * identical only on ASCII text. That assumption is load-bearing for
    * the hash gate, so the gate queries assert it per row (the m01
    * mediaTable pattern): a non-ASCII corpus fails loudly instead of
    * silently hash-diverging. Library ops (fingerprint/topkCms) stay
    * unguarded — byte-hashing is the right production semantics. */
  private def asciiGuarded(docs: DataFrame, opName: String): DataFrame =
    docs.withColumn("text",
      when(octet_length(col("text")) === length(col("text")), col("text"))
        .otherwise(raise_error(concat(
          lit(s"$opName: non-ASCII text in doc_id="), col("doc_id"),
          lit(" (oracle replays the rolling hash over code points)")))))

  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprint(asciiGuarded(Tables.documents(spark, dir), "t04")).orderBy("doc_id")

  /**
   * HASHING-TRICK sparse feature vectors (Weinberger et al. 2009) —
   * the vocabulary-free featurization a 100 TB text pipeline needs:
   * each token hashes straight to one of `dims` buckets (the
   * codegen'd [[graft.functions.RollingHash]] — no vocabulary build,
   * no dictionary broadcast, no state that grows with the corpus)
   * and a second independent rolling hash supplies the ±1 sign that
   * makes collisions cancel in expectation. Output is the sparse
   * (doc, bucket, value) triple set — zero-valued buckets (full
   * cancellation) are dropped by the sparse contract. One explode +
   * one map-side-combined aggregate; shuffle bounded by
   * |docs|·min(dims, doc tokens).
   */
  def featureHash(docs: DataFrame, dims: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(filter(split(Dedup.normText(col("text")), " "),
        w => length(w) > 0)).as("tok"))
    toks.select(col("doc_id"),
        (GraftFunctions.rollingHash(col("tok")) % dims).as("bucket"),
        when(GraftFunctions.rollingHash(col("tok"), 131L, 998244353L) % 2 === 0, 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("doc_id", "bucket").agg(sum("sign").as("val"))
      .filter(col("val") =!= 0)
  }

  /** t22: 64-dim signed hashing-trick features of the corpus (ASCII-
    * guarded: the oracle replays both rolling hashes over code
    * points). */
  def t22FeatureHash(spark: SparkSession, dir: String): DataFrame =
    featureHash(asciiGuarded(Tables.documents(spark, dir), "t22"), 64)
      .orderBy("doc_id", "bucket")

  /**
   * Windowed PMI COLLOCATIONS — the phrase-discovery statistic
   * (pointwise mutual information over co-occurrence events within a
   * ±`window` token span): an event is an ordered position pair
   * (i, j), i < j ≤ i+window; marginals count each event twice (once
   * per side) so pmi = ln(c_xy·N / (m_x·m_y)) is computed over one
   * consistent event space. All counts are exact integers (products
   * ≪ 2^53), so the double ratio and its ln are engine-identical and
   * the top-k ranking has no FP ambiguity. Shape: one in-array pair
   * expansion (no self-join — fan-out is tokens·window per doc,
   * local to the row), map-side-combined pair/marginal aggregates, a
   * vocab-keyed marginal join, TakeOrdered top-k.
   */
  def pmiPairs(docs: DataFrame, window: Int, minCount: Long, k: Int): DataFrame = {
    val ev = docs
      .select(filter(split(Dedup.normText(col("text")), " "),
        w => length(w) > 0).as("w"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, size(w)), i ->
           |  if(i < size(w),
           |    transform(sequence(i + 1, least(i + $window, size(w))), j ->
           |      struct(element_at(w, i) AS x, element_at(w, j) AS y)),
           |    array())))""".stripMargin)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .localCheckpoint(true)
    val cxy = ev.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val marg = ev.select(col("x").as("w")).union(ev.select(col("y").as("w")))
      .groupBy("w").agg(count(lit(1)).as("m"))
    val n = ev.agg(count(lit(1)).as("n"))
    cxy.filter(col("n_xy") >= minCount)
      .crossJoin(broadcast(n))
      .join(marg.select(col("w").as("x"), col("m").as("mx")), "x")
      .join(marg.select(col("w").as("y"), col("m").as("my")), "y")
      .select(col("x"), col("y"), col("n_xy"),
        (round(log((col("n_xy").cast("double") * col("n")) /
          (col("mx") * col("my"))), 4) + lit(0.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("x"), col("y"))
      .limit(k)
  }

  /** t23: top-50 PMI collocations within a 3-token window, min pair
    * count 5. */
  def t23PmiPairs(spark: SparkSession, dir: String): DataFrame =
    pmiPairs(Tables.documents(spark, dir), window = 3, minCount = 5L, k = 50)

  // ---------------------------------------------------- t05 top-k ngrams

  /** Corpus-level top-k word n-grams by document frequency-weighted
    * count — the vocabulary/phrase-statistics pass of a corpus
    * analysis. Shape: explode n-grams → hash-aggregate (map-side
    * partial combine collapses each partition's counts before the ONE
    * shuffle of distinct n-grams) → global top-k (TakeOrdered, no full
    * sort). Deterministic tie-break on the n-gram string. */
  def topkNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val words = split(lower(trim(col("text"))), "\\s+")
    // n-gram i = words[i..i+n-1] joined by spaces; slice is 1-based
    val grams = docs
      .select(words.as("w"))
      .select(explode(expr(
        // guard: sequence(1, 0) is DESCENDING in Spark, not empty
        s"if(size(w) >= $n, transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> array_join(slice(w, i, $n), ' ')), array())")).as("ngram"))
    grams.groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }

  def t05TopkNgrams(spark: SparkSession, dir: String): DataFrame =
    topkNgrams(Tables.documents(spark, dir), n = 2, k = 20)

  /**
   * t21: ZIPF-slope corpus QC — per source, the log-log OLS fit of
   * word frequency against rank over the top-1000 words: natural
   * text runs close to the Zipf exponent −1, while templated /
   * machine-generated / heavily-duplicated corpora flatten or
   * steepen the curve — the corpus-level counterpart of t02's
   * per-document quality score and a standard release-card check
   * next to c10. slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with
   * x = ln rank, y = ln count, plus intercept and r² in closed form.
   * Shapes: one map-side-combined (source, word) count, a
   * source-keyed rank window over the VOCABULARY-sized table (≪
   * corpus — the t05 altitude), rank ≤ 1000 filter, ONE 6-sum
   * aggregate; at 100 TB only the word count touches the data.
   */
  def t21ZipfSlope(spark: SparkSession, dir: String): DataFrame =
    zipfSlope(Tables.documents(spark, dir))

  def zipfSlope(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cnt").desc, col("w"))
    val xy = words.withColumn("rnk", row_number().over(wnd))
      .filter(col("rnk") <= 1000)
      .select(col("source"),
        log(col("rnk").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    val agg = xy.groupBy("source").agg(
      count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    // 1e-9 threshold, not > 0: a CONSTANT count column leaves varY as
    // ±1e-16 cancellation dust whose sign differs between engines —
    // any two genuinely distinct counts give varY ≥ ~1e-3, so the
    // threshold separates dust from signal with six decades to spare
    agg.select(col("source"), col("n").cast("long").as("n_words"),
        when(varX > 1e-9, Norm.r4(covN / varX)).as("zipf_slope"),
        when(varX > 1e-9,
          Norm.r4((col("sy") - (covN / varX) * col("sx")) / col("n")))
          .as("intercept"),
        when(varX > 1e-9 && varY > 1e-9,
          Norm.r4(covN * covN / (varX * varY))).as("r2"))
      .orderBy("source")
  }

  // --------------------------------------------- t16 CMS heavy hitters

  /** Count-Min-Sketch geometry — D independent rows × W counters.
    * Row-d hash of gram g: ((A_d·key + B_d) mod P) mod W over the
    * gram's polynomial rolling hash `key`; every step is integer
    * arithmetic DuckDB replays verbatim (the n02 LSH-replay rule
    * applied to a sketch). Constants are the classic LCG multipliers
    * (public folklore values), fixed so re-runs sketch identically. */
  private val CmsD = 4
  private val CmsW = 1024L
  private val CmsP = 1000000007L
  private val CmsA = Array(1103515245L, 214013L, 69069L, 1664525L)
  private val CmsB = Array(12345L, 2531011L, 362437L, 1013904223L)

  private def cmsHash(d: Int, key: Column): Column =
    pmod(pmod(key * CmsA(d) + CmsB(d), lit(CmsP)), lit(CmsW))

  /**
   * t16: heavy hitters (top-k word bigrams) through a Count-Min
   * Sketch — the BOUNDED-MEMORY scale twin of t05's exact top-k.
   * The sketch is D×W counters no matter the corpus size: gram
   * occurrences reduce map-side into ≤ D·W cells (one tiny
   * aggregate; the shuffle carries at most D·W rows per map
   * partition), and estimates are min over the D cells — the classic
   * CMS guarantee: est ≥ true count, collisions only inflate.
   * Candidate enumeration uses the distinct-gram table (Zipf-bounded
   * ≪ the occurrence stream, the t10/t11 altitude); at scales where
   * even distinct grams hurt, candidates sample or threshold — the
   * sketch side stays D·W regardless. Deterministic polynomial
   * hashes make the whole path (key, cells, estimates, ranking)
   * replayable in the DuckDB oracle.
   */
  def topkCms(docs: DataFrame, k: Int): DataFrame = {
    val words = split(lower(trim(col("text"))), "\\s+")
    val grams = docs.select(words.as("w"))
      .select(explode(expr(
        "if(size(w) >= 2, transform(sequence(1, size(w) - 1), " +
          "i -> array_join(slice(w, i, 2), ' ')), array())")).as("ngram"))
    val keyed = grams.withColumn("key", GraftFunctions.rollingHash(col("ngram")))
    // build: one aggregate bounded by D*W cells at any corpus size
    val cells = keyed
      .select(posexplode(array((0 until CmsD).map(d => cmsHash(d, col("key"))): _*))
        .as(Seq("d", "h")))
      .groupBy("d", "h").agg(count(lit(1)).as("cnt"))
    // probe: distinct grams query their D cells, estimate = min
    val probes = keyed.select("ngram", "key").distinct()
      .select(col("ngram"),
        posexplode(array((0 until CmsD).map(d => cmsHash(d, col("key"))): _*))
          .as(Seq("d", "h")))
    probes.join(broadcast(cells), Seq("d", "h"))
      .groupBy("ngram").agg(min("cnt").as("est"))
      .orderBy(col("est").desc, col("ngram"))
      .limit(k)
  }

  def t16TopkCms(spark: SparkSession, dir: String): DataFrame =
    topkCms(asciiGuarded(Tables.documents(spark, dir), "t16"), k = 20)

  // ----------------------------------------------------------- t07 PII

  // patterns chosen to mean the same thing in Java regex (Spark) and
  // RE2 (DuckDB): character classes + bounded quantifiers only
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val urlRe = "https?://[^\\s]+"
  private val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /**
   * PII scan + redaction — the pre-training privacy filter: count
   * email/URL/phone matches per document and emit the redacted text's
   * fingerprint (emails → `<EMAIL>` etc., on the lowercased text so
   * one normalization covers both count and redaction). Pure
   * codegen'd projection like t01–t04: scanning 100 TB for PII is one
   * pass, and the counts are the routing signal for drop/redact/keep
   * policies downstream.
   */
  def piiScan(docs: DataFrame): DataFrame = {
    val t = lower(col("text"))
    val redacted = regexp_replace(regexp_replace(regexp_replace(t,
      emailRe, "<EMAIL>"), urlRe, "<URL>"), phoneRe, "<PHONE>")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(emailRe)).as("n_emails"),
      regexp_count(t, lit(urlRe)).as("n_urls"),
      regexp_count(t, lit(phoneRe)).as("n_phones"),
      md5(redacted).as("redacted_md5"))
  }

  /** t07: PII scan over the corpus with synthetic PII injected
    * deterministically by doc id (the testdata corpus contains none)
    * — the oracle replays the same injection, so counts and the
    * redacted fingerprint are both exercised with non-trivial
    * values. */
  def t07Pii(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).withColumn("text", concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" see https://data.example.com/doc/"), col("doc_id")))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit(" call 555-867-5309"))
        .otherwise(lit(""))))
    piiScan(docs).orderBy("doc_id")
  }

  // --------------------------------------------------------- t06 BM25

  /**
   * BM25 relevance scores of every document against a fixed query
   * term set (Lucene-style idf: ln((N − df + ½)/(df + ½) + 1), so idf
   * stays positive even for terms in most docs). Shape: per-document
   * term frequencies are pure projections (`filter` over the word
   * array — the query has FEW terms, so no explode/posting shuffle);
   * the corpus statistics (N, avgdl, per-term df) reduce to ONE tiny
   * row that cross-joins back as a broadcast — the same
   * stats-then-broadcast shape as p03's mean fill. At 100 TB this is
   * two scans of `documents` and a one-row exchange, nothing else.
   */
  def bm25(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z0-9]+")),
      s"bm25: terms must be non-empty lowercase word tokens, got $terms")
    val words = split(norm(col("text")), " ")
    val base = docs.select(col("doc_id"), words.as("w"))
      .withColumn("dl", size(col("w")))
    val withTf = terms.foldLeft(base)((d, t) =>
      d.withColumn(s"tf_$t", size(filter(col("w"), x => x === lit(t)))))
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      avg("dl").as("avgdl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
        .cast("double").as(s"df_$t"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val score = terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val idf = log((col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1.0)
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select((col("doc_id") +: col("dl") +:
        terms.map(t => col(s"tf_$t"))) :+ Norm.r4(score).as("bm25"): _*)
  }

  def t06Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(spark, dir), Seq("join", "vector", "stream"))
      .orderBy("doc_id")

  // ----------------------------------------------- t10 tf-idf keywords

  /**
   * Per-document top-k TF-IDF keywords — the corpus-aware keyword
   * extraction behind labeling/routing/topic features. Shapes: term
   * frequencies and document frequencies are two map-side-combined
   * aggregates (shuffle ∝ distinct (doc, term) then vocab); the doc
   * count broadcasts as ONE row (the t06 stats shape); top-k is a
   * per-doc window (bounded partitions — a doc's vocabulary, never
   * the corpus). Deterministic: score ties break on the term.
   */
  def tfidfKeywords(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"tfidfKeywords: k must be positive, got $k")
    val words = docs
      .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // tf feeds BOTH the document-frequency aggregate and the per-doc
    // score join; materialize it once (the d03 signature-table rule)
    // or the corpus is tokenized and shuffled twice
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))
    tf.join(dfreq, "w").crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("w").as("term"),
        Norm.r4(col("score")).as("score"))
  }

  def t10TfidfKeywords(spark: SparkSession, dir: String): DataFrame =
    tfidfKeywords(Tables.documents(spark, dir), k = 3)
      .orderBy("doc_id", "rnk")

  // ------------------------------------------------- t11 unigram xent

  /**
   * Per-document unigram cross-entropy against the corpus's own
   * unigram distribution — the cheap stand-in for the perplexity
   * filter every training-data pipeline runs (docs whose tokens are
   * systematically rare under the corpus LM are boilerplate, OCR
   * noise, or another language; docs too LIKELY are templates). With
   * an external vocabulary table the same plan scores against a real
   * LM's unigram head.
   *
   * xent = −Σ_w tf_w·ln(count_w/N) / n_tokens, computed from TWO
   * map-side-combined aggregates — (doc, token) term frequencies and
   * the global token count as a ONE-ROW broadcast (the t06 stats
   * shape) — then one join back to the per-doc terms: shuffle ∝
   * distinct (doc, token), never positions. The vocabulary table at
   * 100 TB is Zipf-bounded (≪ corpus), and the join key is the
   * token — AQE handles the head-word skew.
   */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // materialized once: tf feeds both the vocabulary aggregate and
    // the per-doc score join (one corpus tokenization, not two)
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val vocab = tf.groupBy("w").agg(sum("tf").as("cnt"))
    val total = vocab.agg(sum("cnt").as("n_total"))
    val perDoc = tf.join(vocab, "w").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * log(col("cnt") / col("n_total").cast("double"))).as("lp"))
      .select(col("doc_id"), col("n_tokens"),
        Norm.r4(-col("lp") / col("n_tokens")).as("unigram_xent"))
    // empty/whitespace-only docs have no tokens: null score, 0 tokens
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("unigram_xent"))
  }

  def t11UnigramLogprob(spark: SparkSession, dir: String): DataFrame =
    unigramLogprob(Tables.documents(spark, dir)).orderBy("doc_id")

  // ------------------------------------------------- t15 bigram xent

  /**
   * Per-document BIGRAM cross-entropy against the corpus's own
   * conditional bigram distribution P(w2|w1) = c(w1,w2)/c(w1·) —
   * t11's perplexity-filter shape with one token of context, which
   * catches the failure unigrams can't: docs whose words are all
   * individually common but strung together implausibly (shuffled
   * text, keyword-stuffed spam, bad OCR segmentation).
   *
   * xent = −Σ tf·ln P(w2|w1) / n_bigrams. Plan shape: bigram pairs
   * come from a per-row zip of the token array with itself shifted
   * (a pure projection — no positions explode), then the (doc,
   * bigram) term-frequency aggregate is checkpointed once and feeds
   * BOTH the corpus LM aggregate and the per-doc score join (the t11
   * single-tokenization rule). Shuffle ∝ distinct (doc, bigram); the
   * LM table is Zipf²-bounded (≪ corpus at scale); trained and
   * scored on the same corpus every doc bigram has LM mass — no
   * smoothing branch. Swap the LM aggregates for a real LM's bigram
   * head and the scoring join is unchanged.
   */
  def bigramLogprob(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(norm(col("text")), " "), w => length(w) > 0).as("ws"))
    val bigrams = toks
      .select(col("doc_id"), explode(when(size(col("ws")) >= 2,
        // sequence() flips to a DESCENDING range when stop < start,
        // so the <2-token guard is load-bearing, not cosmetic
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf = bigrams.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val lm = tf.groupBy("w1", "w2").agg(sum("tf").as("cnt"))
    val ctx = lm.groupBy("w1").agg(sum("cnt").as("ctx"))
    val perDoc = tf.join(lm, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_bigrams"),
        sum(col("tf") * log(col("cnt") / col("ctx").cast("double"))).as("lp"))
      .select(col("doc_id"), col("n_bigrams"),
        Norm.r4(-col("lp") / col("n_bigrams")).as("bigram_xent"))
    // docs with <2 tokens have no bigrams: null score, 0 count
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("bigram_xent"))
  }

  def t15BigramLogprob(spark: SparkSession, dir: String): DataFrame =
    bigramLogprob(Tables.documents(spark, dir)).orderBy("doc_id")

  // ------------------------------------------------------- t18 DSIR

  /**
   * DSIR-style importance weights (Data Selection via Importance
   * Resampling, Xie et al. 2023 — the published pretraining-data
   * selection method): score every raw document by how much more
   * likely its tokens are under a TARGET-domain hashed unigram LM
   * than under the RAW-corpus LM,
   *   logw(doc) = Σ_tok [ln p_t(bucket(tok)) − ln p_r(bucket(tok))],
   * add-one smoothing over a FIXED hashed vocabulary (`buckets`
   * bins). The hashing is the scale trick: both LMs are exactly
   * `buckets` rows no matter the corpus size, so they BROADCAST —
   * scoring 100 TB of documents costs one (doc, bucket) tf
   * aggregate and two broadcast joins, never an LM-side shuffle.
   * Docs with logw > 0 look more target-like than raw-like
   * (DSIR then importance-resamples on these weights — feed
   * `selected`/`logw` straight into c05's weighted sampler).
   *
   * The bucket hash is the codegen'd [[graft.functions.RollingHash]]
   * (DuckDB-mirrorable, the t04 pattern); tokenization is t11's.
   */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    val toks = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(split(norm(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("is_t"),
        (GraftFunctions.rollingHash(col("w")) % buckets).as("b"))
    // one tokenization: tf feeds both LM aggregates and the score join
    val tf = toks.groupBy("doc_id", "is_t", "b").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val tLm = tf.filter(col("is_t")).groupBy("b").agg(sum("tf").as("tc"))
    val rLm = tf.groupBy("b").agg(sum("tf").as("rc"))
    // coalesce: an empty target partition must degrade the smoothed
    // target LM to uniform (add-1 over buckets), not null every logw
    val tTot = tf.filter(col("is_t"))
      .agg(coalesce(sum("tf"), lit(0L)).as("tt"))
    val rTot = tf.agg(sum("tf").as("rt"))
    // rLm join is inner: every doc bucket was counted into the raw LM
    // by construction; tLm is left (bucket may be absent from target)
    val perDoc = tf
      .join(broadcast(tLm), Seq("b"), "left")
      .join(broadcast(rLm), Seq("b"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_tokens"),
        sum(col("tf") *
          (log((coalesce(col("tc"), lit(0L)) + 1.0) / (col("tt") + buckets)) -
            log((col("rc") + 1.0) / (col("rt") + buckets)))).as("logw"))
    // the UNROUNDED logw feeds the threshold (the e14 rule); empty
    // docs carry null logw/selected, 0 tokens
    docs.select(col("doc_id"), isTarget.as("is_target"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        Norm.r4(col("logw")).as("logw"),
        (col("logw") > 0).as("selected"))
  }

  /** t18: DSIR weights with sources src1-src3 as the target domain. */
  def t18Dsir(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(spark, dir),
      col("source").isin("src1", "src2", "src3")).orderBy("doc_id")

  // ----------------------------------------------------- t09 entropy

  /**
   * Character-level Shannon entropy (nats) per document — the cheap
   * compressibility proxy that catches keyboard-mash / padded /
   * binary-ish docs that length and stopword filters miss. Computed
   * as H = ln(n) − (Σ c·ln c)/n from per-character counts, all
   * INSIDE one projection (distinct alphabet → filter-count per
   * char): no shuffle at any corpus size. The per-row alphabet is
   * SORTED before the fold so the double-sum order — and therefore
   * every last ulp — is identical in Spark and the DuckDB oracle.
   *
   * Per-row cost is O(len + |alphabet| log |alphabet|): ONE code-point
   * counting pass per document ([[charEntropySumKernel]] — a TreeMap
   * keeps the Σ c·ln c fold in ascending code-point order, operand
   * for operand the sorted HOF fold's order, so every last ulp still
   * matches the DuckDB oracle). The original nested-HOF projection
   * (one `filter` pass over the chars array per DISTINCT char —
   * O(len × |alphabet|) through interpreted lambda calls, measured
   * as the r18 sweep's heaviest line at 6.2 s) is retained as
   * [[charEntropyHof]] with a spec pinning kernel ≡ HOF row-for-row.
   * Still no shuffle at any corpus size; embarrassingly parallel.
   */
  def charEntropy(docs: DataFrame): DataFrame = {
    val sumUdf = udf(charEntropySumKernel)
    val n = length(col("text"))
    docs.select(col("doc_id"), n.as("n_chars"),
      Norm.r4(when(n > 0,
        log(n.cast("double")) - sumUdf(col("text")) / n.cast("double")))
        .as("char_entropy"))
  }

  /** Σ c·ln c over per-code-point counts, folded in ascending
    * code-point order (= array_sort's UTF8-binary order on one-char
    * strings). Counts are exact longs; each term is c·Math.log(c) —
    * the same double op sequence as the sorted HOF fold. */
  private[graft] val charEntropySumKernel: String => Double = (s: String) => {
    if (s == null) 0.0
    else {
      val counts = new java.util.TreeMap[Integer, java.lang.Long]()
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val prev = counts.get(cp)
        counts.put(cp, if (prev == null) 1L else prev.longValue() + 1L)
        i += Character.charCount(cp)
      }
      var acc = 0.0
      counts.forEach((_, c) =>
        acc = acc + c.longValue().toDouble * math.log(c.longValue().toDouble))
      acc
    }
  }

  /** The original nested-HOF t09 projection — the kernel's
    * cross-check twin (spec-pinned equal row-for-row). */
  private[graft] def charEntropyHof(docs: DataFrame): DataFrame = {
    val chars = col("__chars")
    val counts = transform(array_sort(array_distinct(chars)),
      c => size(filter(chars, x => x === c)).cast("double"))
    val sumClnC = aggregate(counts, lit(0.0), (acc, c) => acc + c * log(c))
    val n = length(col("text"))
    docs
      .withColumn("__chars", split(col("text"), ""))
      .select(col("doc_id"), n.as("n_chars"),
        Norm.r4(when(n > 0,
          log(n.cast("double")) - sumClnC / n.cast("double")))
          .as("char_entropy"))
  }

  def t09CharEntropy(spark: SparkSession, dir: String): DataFrame =
    charEntropy(Tables.documents(spark, dir)).orderBy("doc_id")

  /**
   * t09's LARGE-ALPHABET scale twin: the same per-doc Shannon
   * entropy via a (doc, char) explode + two-level aggregate. t09's
   * pure projection pays O(len · |alphabet|) per row (a filter pass
   * over the chars array per distinct char) — ideal for ASCII-ish
   * text, quadratic-ish for Unicode-heavy docs with thousands of
   * distinct code points. This form pays ONE shuffle bounded by
   * distinct (doc, char) and O(len) per row — the d05/d05b pattern:
   * exact baseline + documented scale path, same output schema.
   */
  def charEntropyAgg(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .filter(length(col("c")) > 0)
      .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
    val perDoc = counts.groupBy("doc_id")
      .agg(sum("cnt").cast("long").as("n_chars"),
        sum(col("cnt").cast("double") * log(col("cnt").cast("double"))).as("clnc"))
      .select(col("doc_id"), col("n_chars"),
        Norm.r4(log(col("n_chars").cast("double"))
          - col("clnc") / col("n_chars").cast("double")).as("char_entropy"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        col("char_entropy"))
  }

  def t12CharEntropyAgg(spark: SparkSession, dir: String): DataFrame =
    charEntropyAgg(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Alphabet threshold above which the aggregate twin (t12) routes
    * in. Historical note: the guard protected the original
    * O(len·|alphabet|) HOF projection; the r18 kernel is O(len)
    * regardless of alphabet, so the guard now only picks between two
    * equally-valid plans (per-row kernel vs explode+aggregate) — the
    * twins are spec-proven output-equal either way. */
  private[graft] val EntropyAlphabetGuard = 256

  /** Automatic t09→t12 routing: estimates the corpus alphabet from a
    * BOUNDED doc sample (one scalar to the driver, cost independent
    * of corpus size) and picks the pure projection under the guard,
    * the explode+aggregate twin over it. The twins are spec-proven
    * output-equal, so routing never changes results — only the plan.
    * A sampled estimate can under-count a rare alphabet tail, but a
    * corpus whose FIRST `sampleDocs` docs are ASCII and whose tail is
    * CJK still computes correctly on the projection, just slower —
    * the guard is a performance gate, not a correctness gate. */
  def charEntropyAuto(docs: DataFrame, sampleDocs: Int = 1000): DataFrame = {
    val alphabet = docs.limit(sampleDocs)
      .select(explode(split(col("text"), "")).as("c"))
      .filter(length(col("c")) > 0)
      .agg(countDistinct(col("c"))).head().getLong(0)
    if (alphabet > EntropyAlphabetGuard) charEntropyAgg(docs) else charEntropy(docs)
  }

  // ------------------------------------------------------ t08 repetition

  /**
   * Repetition signals (the Gopher-rules filter that kills template /
   * boilerplate docs before training): `top_2gram_frac` = fraction of
   * 2-gram instances claimed by the single most frequent 2-gram, and
   * `dup_3gram_frac` = fraction of 3-gram instances that repeat an
   * earlier one. Shapes: the duplicate fraction is a PURE projection
   * (`array_distinct` over the per-row gram array — no shuffle); the
   * top-2-gram needs per-(doc, gram) counts — a two-level aggregate,
   * both levels map-side combined, shuffle bounded by distinct
   * (doc, gram) pairs, never a corpus-global posting list. Reference
   * scope: beyond polars-mas; standard pre-training quality filter.
   */
  def repetition(docs: DataFrame): DataFrame = {
    // per-doc kernel (the t20 lesson): the top-2-gram count and the
    // distinct-3-gram count are pure functions of ONE document, and
    // the old plan exploded every 2-gram into a (doc, gram) count
    // shuffle only to regroup rows that were row-local to begin
    // with. Declarative twin retained below, spec-pinned row-for-row;
    // the fraction assembly is the SAME Column code for both.
    val kudf = udf(repSignalKernel)
    repSignalAssemble(docs
      .select(col("doc_id"), kudf(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_words").as("n_words"),
        col("st.n_2grams").as("n_2grams"), col("st.n_3grams").as("n_3grams"),
        col("st.n_dist_3grams").as("n_dist_3grams"),
        col("st.top2").as("top_2gram_count")))
  }

  /** Original expression-graph form of [[repetition]] — the kernel's
    * semantic pin. */
  private[graft] def repetitionDeclarative(docs: DataFrame): DataFrame = {
    val w = col("__w")
    // same two-step projection as Dedup.withShingles: materialize the
    // words array once so the gram lambdas don't re-split per element
    def grams(n: Int): Column =
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
    val base = docs
      .withColumn("__w", split(Dedup.normText(col("text")), " "))
      .withColumn("__g2", grams(2))
      .withColumn("__g3", grams(3))
    val proj = base.select(
      col("doc_id"),
      size(w).as("n_words"),
      size(col("__g2")).as("n_2grams"),
      size(col("__g3")).as("n_3grams"),
      size(array_distinct(col("__g3"))).as("n_dist_3grams"))
    val top2 = base.select(col("doc_id"), explode(col("__g2")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_2gram_count"))
    repSignalAssemble(proj.join(top2, Seq("doc_id"), "left"))
  }

  private def repSignalAssemble(s: DataFrame): DataFrame =
    s.select(col("doc_id"), col("n_words"), col("n_2grams"),
      Norm.r4(when(col("n_3grams") > 0,
        lit(1.0) - col("n_dist_3grams").cast("double") / col("n_3grams")))
        .as("dup_3gram_frac"),
      col("top_2gram_count"),
      Norm.r4(when(col("n_2grams") > 0,
        col("top_2gram_count").cast("double") / col("n_2grams")))
        .as("top_2gram_frac"))

  /** Kernel emissions (all per-document): top2 is None when the doc
    * has no 2-grams — the declarative left-join miss. */
  private[graft] final case class RepSignalStats(
      n_words: Int, n_2grams: Int, n_3grams: Int, n_dist_3grams: Int,
      top2: Option[Long])

  /** Per-document twin of the declarative t08 stats: same
    * normText → single-space split (NO trim — empty text splits to
    * one empty token, n_words = 1, exactly `split(normText, " ")`),
    * same space-joined gram strings, max count over 2-grams,
    * distinct count over 3-grams. */
  private[graft] val repSignalKernel: String => RepSignalStats = {
    val wsPlus = java.util.regex.Pattern.compile("\\s+")
    (text: String) => {
      if (text == null) null
      else {
        val normed = wsPlus.matcher(text).replaceAll(" ").toLowerCase()
        val ws = normed.split(" ", -1)
        val n = ws.length
        val n2 = math.max(0, n - 1)
        val n3 = math.max(0, n - 2)
        var top2: Option[Long] = None
        if (n2 > 0) {
          val counts = new java.util.HashMap[String, java.lang.Long]()
          var i = 0
          var best = 0L
          while (i < n2) {
            val g = ws(i) + " " + ws(i + 1)
            val c = counts.merge(g, java.lang.Long.valueOf(1L),
              (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
            if (c.longValue > best) best = c.longValue
            i += 1
          }
          top2 = Some(best)
        }
        var nd3 = 0
        if (n3 > 0) {
          val seen = new java.util.HashSet[String]()
          var i = 0
          while (i < n3) {
            if (seen.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2))) nd3 += 1
            i += 1
          }
        }
        RepSignalStats(n, n2, n3, nd3, top2)
      }
    }
  }

  def t08Repetition(spark: SparkSession, dir: String): DataFrame =
    repetition(Tables.documents(spark, dir)).orderBy("doc_id")

  // --------------------------------------------------------- oracle SQL

  private[operators] val normSql = """lower(regexp_replace(text, '\s+', ' ', 'g'))"""
  private[operators] val paddedSql = s"' ' || $normSql || ' '"

  /** t13 oracle: the BPE training loop replayed move-for-move in
    * DuckDB — the n03 fixed-point trick generalized to a discrete
    * model. Per merge round: pair counts over the train subset, the
    * (cnt DESC, pair ASC) argmax, then a RECURSIVE CTE applying that
    * merge to every word by repeated LEFTMOST replacement — the exact
    * greedy semantics of `bpeApplyMerge`. The SQL is static (builder-
    * generated, no data in it); determinism comes from the total
    * tie-break orders on both sides. */
  private def bpeOracleSql: String =
    bpeOracleCore +
      s""",
         |agg AS (SELECT w1.doc_id, count(*) AS n_words, CAST(sum(tok.wt) AS BIGINT) AS n_tokens
         |  FROM w1 JOIN tok USING (w) GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
         |  coalesce(a.n_tokens, 0) AS n_tokens,
         |  round(CAST(a.n_tokens AS DOUBLE) / a.n_words, 4) + 0 AS avg_word_tokens
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id ORDER BY d.doc_id""".stripMargin

  /** t24 oracle: the same trained-segmentation CTE aggregated per
    * LANGUAGE with the byte totals fertility is quoted against. */
  private def fertilityOracleSql: String =
    bpeOracleCore +
      s""",
         |agg AS (SELECT w1.doc_id, count(*) AS n_words, CAST(sum(tok.wt) AS BIGINT) AS n_tokens
         |  FROM w1 JOIN tok USING (w) GROUP BY 1),
         |fd AS (
         |  SELECT d.lang, octet_length(encode(d.text)) AS n_bytes,
         |    a.n_words, a.n_tokens
         |  FROM documents d JOIN agg a ON d.doc_id = a.doc_id
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words), 4) + 0 AS fertility,
         |  round(CAST(sum(n_bytes) AS DOUBLE) / sum(n_tokens), 4) + 0 AS bytes_per_token
         |FROM fd GROUP BY lang ORDER BY lang""".stripMargin

  /** The BPE train + word-segmentation replay (everything through the
    * per-word token-count table `tok`), shared by t13 and t24. */
  private def bpeOracleCore: String = {
    val wsSplit = """str_split_regex(text, '\s+')"""
    val rounds = (1 to BpeMerges).map { r =>
      val p = r - 1
      s"""ex_$r AS (SELECT freq, str_split(trim(s), ' ') AS l FROM seg_$p WHERE is_train),
         |px_$r AS (SELECT freq, l, unnest(generate_series(1, len(l) - 1)) AS i FROM ex_$r),
         |pc_$r AS (SELECT l[i] || ' ' || l[i + 1] AS pair, sum(freq) AS cnt FROM px_$r GROUP BY 1),
         |bst_$r AS MATERIALIZED (SELECT ' ' || pair || ' ' AS pat, ' ' || replace(pair, ' ', '') || ' ' AS rep
         |  FROM pc_$r ORDER BY cnt DESC, pair LIMIT 1),
         |it_$r AS (
         |  SELECT g.w, g.freq, g.is_train, g.s FROM seg_$p g
         |  UNION ALL
         |  SELECT t.w, t.freq, t.is_train,
         |    substr(t.s, 1, strpos(t.s, b.pat) - 1) || b.rep ||
         |      substr(t.s, strpos(t.s, b.pat) + length(b.pat)) AS s
         |  FROM it_$r t, bst_$r b WHERE strpos(t.s, b.pat) > 0
         |),
         |seg_$r AS MATERIALIZED (SELECT t.w, t.freq, t.is_train, t.s FROM it_$r t, bst_$r b
         |  WHERE strpos(t.s, b.pat) = 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE w0 AS (
       |  SELECT doc_id, unnest($wsSplit) AS w FROM documents
       |), w1 AS MATERIALIZED (SELECT doc_id, w FROM w0 WHERE length(w) > 0),
       |wf AS MATERIALIZED (SELECT w, count(*) AS freq FROM w1 GROUP BY w),
       |train AS (SELECT w FROM wf ORDER BY freq DESC, w LIMIT $BpeTrainWords),
       |seg_0 AS MATERIALIZED (
       |  SELECT wf.w, wf.freq, (train.w IS NOT NULL) AS is_train,
       |    ' ' || array_to_string(list_transform(range(1, length(wf.w) + 1), i -> wf.w[i]), ' ') || ' ' AS s
       |  FROM wf LEFT JOIN train ON wf.w = train.w
       |),
       |$rounds,
       |tok AS (SELECT w, len(str_split(trim(s), ' ')) AS wt FROM seg_$BpeMerges)""".stripMargin
  }

  /** t14 oracle: one level of the line-stats pipeline (re-line,
    * explode, two-level aggregate) as CTEs with the given prefix. */
  private def lineLevelSql(n: Int, pfx: String): String =
    s"""${pfx}0 AS (
       |  SELECT doc_id, trim(unnest(str_split(${relinedSql(n)}, chr(10)))) AS l
       |  FROM documents
       |), ${pfx}1 AS (SELECT doc_id, l FROM ${pfx}0 WHERE length(l) > 0),
       |${pfx}c AS (SELECT doc_id, l, count(*) AS cnt FROM ${pfx}1 GROUP BY 1, 2),
       |${pfx}s AS (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n, count(*) AS n_distinct,
       |    CAST(sum((cnt - 1) * length(l)) AS BIGINT) AS dup_chars,
       |    CAST(sum(cnt * length(l)) AS BIGINT) AS tot_chars,
       |    CAST(sum(CASE WHEN right(l, 1) IN ('.', '!', '?', '"') THEN cnt ELSE 0 END) AS BIGINT) AS punct
       |  FROM ${pfx}c GROUP BY doc_id
       |)""".stripMargin

  val oracleSql: Map[String, String] = {
    val scoreSql = langWords.map { case (lang, words) =>
      words.map(w => occSql("p", w)).mkString(" + ") + s" AS ${lang}_score"
    }.mkString(",\n    ")
    Map(
      // same regex proxies (RE2 ≡ Java for these classes), same
      // operation order, band on the rounded score
      "t17_readability" ->
        """WITH f AS (
          |  SELECT doc_id,
          |    greatest(len(string_split_regex(trim(text), '\s+')), 1) * 1.0 AS w,
          |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) * 1.0 AS s,
          |    greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) * 1.0 AS y
          |  FROM documents
          |), g AS (
          |  SELECT doc_id, w, s, y,
          |    round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4) + 0 AS flesch
          |  FROM f
          |)
          |SELECT doc_id, CAST(w AS BIGINT) AS n_words,
          |  CAST(s AS BIGINT) AS n_sentences, CAST(y AS BIGINT) AS n_syllables,
          |  flesch,
          |  CASE WHEN flesch >= 70 THEN 'easy' WHEN flesch >= 50 THEN 'medium'
          |    WHEN flesch >= 30 THEN 'hard' ELSE 'very_hard' END AS band
          |FROM g ORDER BY doc_id""".stripMargin,
      // t19: same occ length-arithmetic, same re-lining, same regex
      // classes (RE2 ≡ Java here); every ratio rounded before the
      // threshold compare so the keep bit can't straddle an engine ulp
      "t19_gopher_gate" -> {
        val wsArr = """string_split_regex(trim(text), '\s+')"""
        val nonwsSql = """length(regexp_replace(text, '\s', '', 'g'))"""
        val rl = relinedSql(12)
        val stopSql = gopherStops.map(w =>
          s"(CASE WHEN ${occSql("p", s" $w ")} > 0 THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH b AS (
           |  SELECT doc_id, text, $paddedSql AS p FROM documents
           |), f AS (
           |  SELECT doc_id,
           |    CASE WHEN trim(text) = '' THEN 0.0
           |      ELSE len($wsArr) * 1.0 END AS nw,
           |    $nonwsSql * 1.0 AS nonws,
           |    ${occSql("text", "#")} + ${occSql("text", "...")} AS sym,
           |    CASE WHEN trim(text) = '' THEN 0.0
           |      ELSE len(list_filter($wsArr,
           |        w -> regexp_matches(w, '[A-Za-z]'))) * 1.0 END AS alphaw,
           |    len(str_split($rl, chr(10))) * 1.0 AS nlines,
           |    len(list_filter(str_split($rl, chr(10)),
           |      l -> regexp_matches(trim(l), '^[-*] '))) * 1.0 AS bulletl,
           |    len(list_filter(str_split($rl, chr(10)),
           |      l -> right(trim(l), 3) = '...')) * 1.0 AS ellipl,
           |    $stopSql AS stop_hits
           |  FROM b
           |), g AS (
           |  SELECT doc_id, nw, stop_hits,
           |    CASE WHEN nw > 0 THEN round(nonws / nw, 4) + 0 END AS mean_wlen,
           |    CASE WHEN nw > 0 THEN round(sym / nw, 4) + 0 END AS symbol_ratio,
           |    round(bulletl / nlines, 4) + 0 AS bullet_frac,
           |    round(ellipl / nlines, 4) + 0 AS ellipsis_frac,
           |    CASE WHEN nw > 0 THEN round(alphaw / nw, 4) + 0 END AS alpha_frac
           |  FROM f
           |)
           |SELECT doc_id, CAST(nw AS BIGINT) AS n_words, mean_wlen, symbol_ratio,
           |  bullet_frac, ellipsis_frac, alpha_frac,
           |  CAST(stop_hits AS BIGINT) AS stop_hits,
           |  CAST((CASE WHEN coalesce(nw >= 50 AND nw <= 100000, false) THEN 0 ELSE 1 END)
           |    + (CASE WHEN coalesce(mean_wlen >= 3 AND mean_wlen <= 10, false) THEN 0 ELSE 1 END)
           |    + (CASE WHEN coalesce(symbol_ratio < 0.1, false) THEN 0 ELSE 1 END)
           |    + (CASE WHEN coalesce(bullet_frac < 0.9, false) THEN 0 ELSE 1 END)
           |    + (CASE WHEN coalesce(ellipsis_frac < 0.3, false) THEN 0 ELSE 1 END)
           |    + (CASE WHEN coalesce(alpha_frac > 0.8, false) THEN 0 ELSE 1 END)
           |    + (CASE WHEN coalesce(stop_hits >= 2, false) THEN 0 ELSE 1 END) AS BIGINT) AS n_failed,
           |  (nw >= 50 AND nw <= 100000 AND mean_wlen >= 3 AND mean_wlen <= 10
           |    AND symbol_ratio < 0.1 AND bullet_frac < 0.9
           |    AND ellipsis_frac < 0.3 AND alpha_frac > 0.8
           |    AND stop_hits >= 2) AS keep
           |FROM g ORDER BY doc_id""".stripMargin
      },
      // t20: full mirror of the repetition-gate pipeline — tagged
      // gram union, (doc, n, gram) counts, longest-top-gram argmax
      // via the same bounded count-table join, t14's two-level
      // line/para aggregate, every frac rounded BEFORE its threshold
      "t20_repetition_gate" -> {
        val ns = topGramThr.map(_._1) ++ dupGramThr.map(_._1)
        val gramSel = ns.map { n =>
          val cat = (0 until n).map(j =>
            if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
          s"""  SELECT doc_id, $n AS n, unnest(
             |    CASE WHEN len(w) < $n THEN CAST([] AS VARCHAR[])
             |    ELSE list_transform(range(1, len(w) - $n + 2), i -> $cat) END) AS g
             |  FROM b""".stripMargin
        }.mkString("\nUNION ALL\n")
        val gsCols = (topGramThr.map { case (n, _) =>
          s"max(CASE WHEN m.n = $n THEN " +
            s"CASE WHEN m.mc > 1 THEN m.mc * w.wlen ELSE 0 END END) AS top${n}c"
        } ++ dupGramThr.map { case (n, _) =>
          s"max(CASE WHEN m.n = $n THEN m.dupch END) AS dup${n}c"
        }).mkString(",\n    ")
        def ratio(num: String, den: String) = // least ignores NULLs: guard
          s"CASE WHEN $den > 0 AND ($num) IS NOT NULL " +
            s"THEN round(least(1.0, ($num) * 1.0 / $den), 4) + 0 END"
        val fracSql: Seq[(String, String, Double)] = Seq(
          ("dup_line_frac", ratio("l_n - l_d", "l_n"), 0.30),
          ("dup_line_char_frac", ratio("l_dupch", "l_totch"), 0.20),
          ("dup_para_frac", ratio("p_n - p_d", "p_n"), 0.30),
          ("dup_para_char_frac", ratio("p_dupch", "p_totch"), 0.20)) ++
          topGramThr.map { case (n, thr) =>
            (s"top_${n}gram_char_frac", ratio(s"top${n}c", "tot"), thr) } ++
          dupGramThr.map { case (n, thr) =>
            (s"dup_${n}gram_char_frac", ratio(s"dup${n}c", "tot"), thr) }
        val fracCols = fracSql.map { case (nm, ex, _) => s"$ex AS $nm" }
          .mkString(",\n    ")
        val nFail = fracSql.map { case (nm, _, thr) =>
          s"(CASE WHEN coalesce($nm <= $thr, true) THEN 0 ELSE 1 END)"
        }.mkString("\n    + ")
        val keep = fracSql.map { case (nm, _, thr) =>
          s"coalesce($nm <= $thr, true)" }.mkString("\n    AND ")
        s"""WITH d AS (
           |  SELECT doc_id, text, $normSql AS nt FROM documents
           |), b AS (
           |  SELECT doc_id, string_split(nt, ' ') AS w FROM d
           |), gr AS (
           |$gramSel
           |), cnt AS (
           |  SELECT doc_id, n, g, count(*) AS c FROM gr GROUP BY 1, 2, 3
           |), mx AS (
           |  SELECT doc_id, n, max(c) AS mc,
           |    sum(CASE WHEN c > 1 THEN (c - 1) * length(g) ELSE 0 END) AS dupch
           |  FROM cnt GROUP BY 1, 2
           |), win AS (
           |  SELECT c.doc_id, c.n, max(length(c.g)) AS wlen
           |  FROM cnt c JOIN mx m ON c.doc_id = m.doc_id AND c.n = m.n AND c.c = m.mc
           |  GROUP BY 1, 2
           |), gs AS (
           |  SELECT m.doc_id,
           |    $gsCols
           |  FROM mx m JOIN win w ON m.doc_id = w.doc_id AND m.n = w.n
           |  GROUP BY 1
           |), seg AS (
           |  SELECT doc_id, 'l' AS lvl, trim(l) AS l FROM (
           |    SELECT doc_id, unnest(str_split(${relinedSql(3)}, chr(10))) AS l FROM d)
           |  UNION ALL
           |  SELECT doc_id, 'p', trim(l) FROM (
           |    SELECT doc_id, unnest(str_split(${relinedSql(12)}, chr(10))) AS l FROM d)
           |), pl AS (
           |  SELECT doc_id, lvl, l, count(*) AS cnt FROM seg
           |  WHERE length(l) > 0 GROUP BY 1, 2, 3
           |), ls AS (
           |  SELECT doc_id,
           |    sum(CASE WHEN lvl = 'l' THEN cnt END) AS l_n,
           |    count(CASE WHEN lvl = 'l' THEN 1 END) AS l_d,
           |    sum(CASE WHEN lvl = 'l' THEN (cnt - 1) * length(l) END) AS l_dupch,
           |    sum(CASE WHEN lvl = 'l' THEN cnt * length(l) END) AS l_totch,
           |    sum(CASE WHEN lvl = 'p' THEN cnt END) AS p_n,
           |    count(CASE WHEN lvl = 'p' THEN 1 END) AS p_d,
           |    sum(CASE WHEN lvl = 'p' THEN (cnt - 1) * length(l) END) AS p_dupch,
           |    sum(CASE WHEN lvl = 'p' THEN cnt * length(l) END) AS p_totch
           |  FROM pl GROUP BY 1
           |), f AS (
           |  SELECT t.doc_id,
           |    $fracCols
           |  FROM (SELECT doc_id, length(nt) * 1.0 AS tot FROM d) t
           |  LEFT JOIN ls ON t.doc_id = ls.doc_id
           |  LEFT JOIN gs ON t.doc_id = gs.doc_id
           |)
           |SELECT doc_id, ${fracSql.map(_._1).mkString(", ")},
           |  CAST($nFail AS BIGINT) AS n_failed,
           |  ($keep) AS keep
           |FROM f ORDER BY doc_id""".stripMargin
      },
      // t18: same rolling-hash bucket mirror as t04 (per-word), same
      // tokenization as t11; operand order of the smoothed log-ratio
      // matches the Spark expression term-for-term, and the UNROUNDED
      // logw feeds the selected threshold in both engines
      "t18_dsir" ->
        s"""WITH w AS (
           |  SELECT doc_id, source IN ('src1', 'src2', 'src3') AS is_t,
           |    unnest(string_split($normSql, ' ')) AS w
           |  FROM documents
           |), w2 AS (
           |  SELECT doc_id, is_t,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(string_split(w, ''), x -> CAST(ord(x) AS BIGINT))),
           |      (acc, x) -> (acc * 31 + x) % 1000000007) % 4096 AS b
           |  FROM w WHERE length(w) > 0
           |), tf AS (SELECT doc_id, is_t, b, count(*) AS tf FROM w2 GROUP BY 1, 2, 3),
           |tl AS (SELECT b, sum(tf) AS tc FROM tf WHERE is_t GROUP BY b),
           |rl AS (SELECT b, sum(tf) AS rc FROM tf GROUP BY b),
           |tt AS (SELECT sum(tf) AS tt FROM tf WHERE is_t),
           |rt AS (SELECT sum(tf) AS rt FROM tf),
           |p AS (
           |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           |    sum(tf.tf * (ln((coalesce(tl.tc, 0) + 1.0) / (tt.tt + 4096))
           |      - ln((rl.rc + 1.0) / (rt.rt + 4096)))) AS logw
           |  FROM tf LEFT JOIN tl USING (b) JOIN rl USING (b), tt, rt
           |  GROUP BY 1
           |)
           |SELECT d.doc_id, d.source IN ('src1', 'src2', 'src3') AS is_target,
           |  coalesce(p.n_tokens, 0) AS n_tokens,
           |  round(p.logw, 4) + 0 AS logw, p.logw > 0 AS selected
           |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
      "t11_unigram_logprob" ->
        s"""WITH w AS (
           |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS w FROM documents
           |), w2 AS (SELECT doc_id, w FROM w WHERE length(w) > 0),
           |tf AS (SELECT doc_id, w, count(*) AS tf FROM w2 GROUP BY 1, 2),
           |v AS (SELECT w, sum(tf) AS cnt FROM tf GROUP BY w),
           |n AS (SELECT sum(cnt) AS n_total FROM v),
           |p AS (
           |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           |    sum(tf.tf * ln(cnt / CAST(n_total AS DOUBLE))) AS lp
           |  FROM tf JOIN v USING (w), n GROUP BY 1
           |)
           |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
           |  round(-lp / p.n_tokens, 4) + 0 AS unigram_xent
           |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
      "t15_bigram_logprob" ->
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    list_filter(string_split($normSql, ' '), w -> length(w) > 0) AS ws
           |  FROM documents
           |), bg AS (
           |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
           |  FROM toks, unnest(range(1, len(ws))) AS t(i)
           |  WHERE len(ws) >= 2
           |), tf AS (
           |  SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3
           |), lm AS (SELECT w1, w2, sum(tf) AS cnt FROM tf GROUP BY 1, 2),
           |ctx AS (SELECT w1, sum(cnt) AS ctx FROM lm GROUP BY 1),
           |p AS (
           |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
           |    sum(tf.tf * ln(lm.cnt / CAST(ctx.ctx AS DOUBLE))) AS lp
           |  FROM tf JOIN lm USING (w1, w2) JOIN ctx USING (w1)
           |  GROUP BY 1
           |)
           |SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
           |  round(-lp / p.n_bigrams, 4) + 0 AS bigram_xent
           |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
      "t12_char_entropy_agg" ->
        """WITH ch AS (
          |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
          |), k AS (
          |  SELECT doc_id, c, count(*) AS cnt FROM ch WHERE length(c) > 0 GROUP BY 1, 2
          |), p AS (
          |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
          |    sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS clnc
          |  FROM k GROUP BY doc_id
          |)
          |SELECT d.doc_id, coalesce(p.n_chars, 0) AS n_chars,
          |  round(ln(CAST(p.n_chars AS DOUBLE)) - clnc / p.n_chars, 4) + 0 AS char_entropy
          |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,
      "t13_bpe_tokens" -> bpeOracleSql,
      "t24_tokenizer_fertility" -> fertilityOracleSql,
      "t14_line_stats" ->
        s"""WITH ${lineLevelSql(3, "ln")},
           |${lineLevelSql(12, "pr")}
           |SELECT lns.doc_id, lns.n AS n_lines,
           |  round((lns.n - lns.n_distinct) / CAST(lns.n AS DOUBLE), 4) + 0 AS dup_line_frac,
           |  round(lns.dup_chars / CAST(lns.tot_chars AS DOUBLE), 4) + 0 AS dup_line_char_frac,
           |  round(lns.punct / CAST(lns.n AS DOUBLE), 4) + 0 AS term_punct_frac,
           |  round((prs.n - prs.n_distinct) / CAST(prs.n AS DOUBLE), 4) + 0 AS dup_para_frac
           |FROM lns JOIN prs USING (doc_id) ORDER BY doc_id""".stripMargin,
      "t01_langid" ->
        s"""WITH p0 AS (SELECT doc_id, lang, $paddedSql AS p FROM documents),
           |s AS (SELECT doc_id, lang,
           |    $scoreSql
           |  FROM p0)
           |SELECT doc_id, lang, en_score, de_score, es_score, fr_score,
           |  CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
           |    WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
           |    WHEN es_score >= fr_score THEN 'es'
           |    ELSE 'fr' END AS pred_lang
           |FROM s ORDER BY doc_id""".stripMargin,
      "t02_quality" ->
        s"""WITH b AS (
           |  SELECT doc_id, text, $normSql AS nt, $paddedSql AS p,
           |    string_split($normSql, ' ') AS w
           |  FROM documents
           |)
           |SELECT doc_id, length(text) AS n_chars, len(w) AS n_words,
           |  round((${occSql("p", " the ")}) / len(w), 4) AS stop_ratio,
           |  round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 4) AS dup_word_ratio,
           |  round(len(regexp_extract_all(text, '[A-Z]')) * 1.0 / length(text), 4) AS upper_ratio
           |FROM b ORDER BY doc_id""".stripMargin,
      "t03_tokens" ->
        """SELECT doc_id,
          |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
          |  len(regexp_extract_all(lower(text), '[a-z]+')) AS alpha_tokens,
          |  len(regexp_extract_all(text, '[0-9]+')) AS num_tokens,
          |  len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS other_tokens,
          |  round(length(text) * 1.0 / len(string_split_regex(trim(text), '\s+')), 4) AS chars_per_token
          |FROM documents ORDER BY doc_id""".stripMargin,
      // t23: same pair expansion (DuckDB generate_series is empty
      // when start > stop, so no Spark-style if guard), integer
      // counts, identical double ratio + ln
      "t23_pmi_pairs" ->
        s"""WITH b AS (
           |  SELECT list_filter(string_split($normSql, ' '),
           |    t -> length(t) > 0) AS w
           |  FROM documents
           |), pe AS (
           |  SELECT unnest(flatten(list_transform(generate_series(1, len(w)), i ->
           |    list_transform(generate_series(i + 1, least(i + 3, len(w))), j ->
           |      {'x': w[i], 'y': w[j]})))) AS p
           |  FROM b
           |), ev AS (
           |  SELECT p.x AS x, p.y AS y FROM pe
           |), cxy AS (
           |  SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM ev GROUP BY 1, 2
           |), m AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS m FROM (
           |    SELECT x AS w FROM ev UNION ALL SELECT y AS w FROM ev) GROUP BY 1
           |), nn AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n FROM ev
           |)
           |SELECT c.x, c.y, c.n_xy,
           |  round(ln((CAST(c.n_xy AS DOUBLE) * nn.n) / (mx.m * my.m)), 4) + 0 AS pmi
           |FROM cxy c CROSS JOIN nn
           |JOIN m mx ON c.x = mx.w
           |JOIN m my ON c.y = my.w
           |WHERE c.n_xy >= 5
           |ORDER BY pmi DESC, c.x, c.y LIMIT 50""".stripMargin,
      // t22: both rolling hashes replayed over code points (ASCII-
      // guarded in the engine); sum(sign) CAST from HUGEINT
      "t22_feature_hash" ->
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(list_filter(string_split($normSql, ' '),
           |    w -> length(w) > 0)) AS tok
           |  FROM documents
           |), h AS (
           |  SELECT doc_id,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(string_split(tok, ''), x -> CAST(ord(x) AS BIGINT))),
           |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS bucket,
           |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(string_split(tok, ''), x -> CAST(ord(x) AS BIGINT))),
           |      (acc, x) -> (acc * 131 + x) % 998244353) % 2 = 0
           |      THEN 1 ELSE -1 END AS sign
           |  FROM toks
           |)
           |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS val
           |FROM h GROUP BY 1, 2 HAVING sum(sign) <> 0
           |ORDER BY doc_id, bucket""".stripMargin,
      "t04_fingerprint" ->
        s"""SELECT doc_id, md5($normSql) AS fp_md5,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(string_split($normSql, ''), x -> CAST(ord(x) AS BIGINT))),
           |    (acc, x) -> (acc * 31 + x) % 1000000007) AS roll_hash
           |FROM documents ORDER BY doc_id""".stripMargin,
      "t07_pii" ->
        s"""WITH aug AS (
           |  SELECT doc_id, lower(text
           |    || CASE WHEN doc_id % 7 = 0
           |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
           |         ELSE '' END
           |    || CASE WHEN doc_id % 11 = 0
           |         THEN ' see https://data.example.com/doc/' || CAST(doc_id AS VARCHAR)
           |         ELSE '' END
           |    || CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309' ELSE '' END) AS t
           |  FROM documents
           |)
           |SELECT doc_id,
           |  len(regexp_extract_all(t, '$emailRe')) AS n_emails,
           |  len(regexp_extract_all(t, '$urlRe')) AS n_urls,
           |  len(regexp_extract_all(t, '$phoneRe')) AS n_phones,
           |  md5(regexp_replace(regexp_replace(regexp_replace(t,
           |    '$emailRe', '<EMAIL>', 'g'), '$urlRe', '<URL>', 'g'),
           |    '$phoneRe', '<PHONE>', 'g')) AS redacted_md5
           |FROM aug ORDER BY doc_id""".stripMargin,
      "t06_bm25" ->
        s"""WITH base AS (
           |  SELECT doc_id, string_split($normSql, ' ') AS w,
           |    len(string_split($normSql, ' ')) AS dl
           |  FROM documents
           |), tf AS (
           |  SELECT doc_id, dl,
           |    len(list_filter(w, x -> x = 'join')) AS tf_join,
           |    len(list_filter(w, x -> x = 'vector')) AS tf_vector,
           |    len(list_filter(w, x -> x = 'stream')) AS tf_stream
           |  FROM base
           |), stats AS (
           |  SELECT count(*) * 1.0 AS n_docs, avg(dl) AS avgdl,
           |    sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) * 1.0 AS df_join,
           |    sum(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) * 1.0 AS df_vector,
           |    sum(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) * 1.0 AS df_stream
           |  FROM tf
           |)
           |SELECT t.doc_id, t.dl, t.tf_join, t.tf_vector, t.tf_stream,
           |  round(
           |    ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
           |      * t.tf_join * 2.2 / (t.tf_join + 1.2 * (0.25 + 0.75 * t.dl / avgdl))
           |    + ln((n_docs - df_vector + 0.5) / (df_vector + 0.5) + 1.0)
           |      * t.tf_vector * 2.2 / (t.tf_vector + 1.2 * (0.25 + 0.75 * t.dl / avgdl))
           |    + ln((n_docs - df_stream + 0.5) / (df_stream + 0.5) + 1.0)
           |      * t.tf_stream * 2.2 / (t.tf_stream + 1.2 * (0.25 + 0.75 * t.dl / avgdl))
           |  , 4) + 0 AS bm25
           |FROM tf t, stats ORDER BY t.doc_id""".stripMargin,
      "t10_tfidf_keywords" ->
        s"""WITH w AS (
           |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS w FROM documents
           |), w2 AS (SELECT doc_id, w FROM w WHERE length(w) > 0),
           |tf AS (SELECT doc_id, w, count(*) AS tf FROM w2 GROUP BY doc_id, w),
           |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
           |n AS (SELECT count(*) AS n_docs FROM documents),
           |s AS (
           |  SELECT tf.doc_id, tf.w, tf.tf * ln(CAST(n_docs AS DOUBLE) / df) AS score
           |  FROM tf JOIN dfq USING (w), n
           |), r AS (
           |  SELECT doc_id, w, score,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
           |  FROM s
           |)
           |SELECT doc_id, CAST(rnk AS INT) AS rnk, w AS term,
           |  round(score, 4) + 0 AS score
           |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
      "t09_char_entropy" ->
        """WITH c AS (
          |  SELECT doc_id, length(text) AS n, string_split(text, '') AS ch
          |  FROM documents
          |), k AS (
          |  SELECT doc_id, n,
          |    list_transform(list_sort(list_distinct(ch)),
          |      c -> CAST(len(list_filter(ch, x -> x = c)) AS DOUBLE)) AS cnts
          |  FROM c
          |)
          |SELECT doc_id, CAST(n AS INT) AS n_chars,
          |  CASE WHEN n > 0 THEN
          |    round(ln(CAST(n AS DOUBLE)) -
          |      list_reduce(list_prepend(CAST(0 AS DOUBLE), cnts),
          |        (a, x) -> a + x * ln(x)) / CAST(n AS DOUBLE), 4) + 0
          |  END AS char_entropy
          |FROM k ORDER BY doc_id""".stripMargin,
      "t08_repetition" ->
        s"""WITH w AS (
           |  SELECT doc_id, string_split($normSql, ' ') AS w FROM documents
           |), g AS (
           |  SELECT doc_id, len(w) AS n_words,
           |    CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
           |         ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END AS g2,
           |    CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
           |         ELSE list_transform(range(1, len(w) - 1),
           |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS g3
           |  FROM w
           |), cnt AS (
           |  SELECT doc_id, gr, count(*) AS c
           |  FROM (SELECT doc_id, unnest(g2) AS gr FROM g) GROUP BY doc_id, gr
           |), t AS (
           |  SELECT doc_id, max(c) AS top_2gram_count FROM cnt GROUP BY doc_id
           |)
           |SELECT g.doc_id, CAST(n_words AS INT) AS n_words,
           |  CAST(len(g2) AS INT) AS n_2grams,
           |  CASE WHEN len(g3) > 0
           |    THEN round(1.0 - len(list_distinct(g3)) * 1.0 / len(g3), 4) + 0 END
           |    AS dup_3gram_frac,
           |  t.top_2gram_count,
           |  CASE WHEN len(g2) > 0
           |    THEN round(t.top_2gram_count * 1.0 / len(g2), 4) + 0 END
           |    AS top_2gram_frac
           |FROM g LEFT JOIN t ON g.doc_id = t.doc_id
           |ORDER BY g.doc_id""".stripMargin,
      // t21: word counts per source, rank window with the identical
      // (cnt desc, word) tie-break, ln sums, closed-form OLS — each
      // arithmetic step mirrors the engine's operand order
      "t21_zipf_slope" ->
        """WITH w AS (
          |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
          |  FROM documents
          |), cnts AS (
          |  SELECT source, w, count(*) AS cnt FROM w GROUP BY 1, 2
          |), ranked AS (
          |  SELECT source, cnt,
          |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, w) AS rnk
          |  FROM cnts
          |), xy AS (
          |  SELECT source, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
          |  FROM ranked WHERE rnk <= 1000
          |), agg AS (
          |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
          |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          |    sum(x * x) AS sxx, sum(y * y) AS syy
          |  FROM xy GROUP BY source
          |), f AS (
          |  SELECT source, n, sx, sy,
          |    n * sxy - sx * sy AS covn,
          |    n * sxx - sx * sx AS varx,
          |    n * syy - sy * sy AS vary
          |  FROM agg
          |)
          |SELECT source, CAST(n AS BIGINT) AS n_words,
          |  CASE WHEN varx > 0.000000001 THEN round(covn / varx, 4) + 0 END AS zipf_slope,
          |  CASE WHEN varx > 0.000000001 THEN
          |    round((sy - (covn / varx) * sx) / n, 4) + 0 END AS intercept,
          |  CASE WHEN varx > 0.000000001 AND vary > 0.000000001 THEN
          |    round(covn * covn / (varx * vary), 4) + 0 END AS r2
          |FROM f ORDER BY source""".stripMargin,
      "t05_topk_ngrams" ->
        """WITH w AS (
          |  SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
          |), g AS (
          |  SELECT unnest(list_transform(range(1, len(w)),
          |    i -> w[i] || ' ' || w[i+1])) AS ngram
          |  FROM w
          |)
          |SELECT ngram, count(*) AS cnt FROM g
          |GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin,
      // full CMS replay: same rolling-hash key, same LCG row hashes,
      // same D x W cells, same min-estimate and ranking
      "t16_topk_cms" ->
        """WITH w AS (
          |  SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
          |), g AS (
          |  SELECT unnest(list_transform(range(1, len(w)),
          |    i -> w[i] || ' ' || w[i+1])) AS ngram
          |  FROM w
          |), kg AS (
          |  SELECT ngram, list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(string_split(ngram, ''), x -> CAST(ord(x) AS BIGINT))),
          |    (acc, x) -> (acc * 31 + x) % 1000000007) AS key
          |  FROM g
          |), hashed AS (
          |  SELECT ngram, key, t.d,
          |    ((key * (CASE t.d WHEN 0 THEN 1103515245 WHEN 1 THEN 214013
          |        WHEN 2 THEN 69069 ELSE 1664525 END)
          |      + (CASE t.d WHEN 0 THEN 12345 WHEN 1 THEN 2531011
          |        WHEN 2 THEN 362437 ELSE 1013904223 END))
          |     % 1000000007) % 1024 AS h
          |  FROM kg, unnest(range(0, 4)) AS t(d)
          |), cells AS (
          |  SELECT d, h, count(*) AS cnt FROM hashed GROUP BY 1, 2
          |), pe AS (
          |  SELECT DISTINCT ngram, d, h FROM hashed
          |), est AS (
          |  SELECT pe.ngram, min(cells.cnt) AS est
          |  FROM pe JOIN cells USING (d, h) GROUP BY 1
          |)
          |SELECT ngram, CAST(est AS BIGINT) AS est FROM est
          |ORDER BY est DESC, ngram LIMIT 20""".stripMargin,
    )
  }
}
