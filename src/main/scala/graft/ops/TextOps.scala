package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, quality scoring, language identification, fingerprinting,
  * shingling. All pure Column expressions (codegen'd, no UDFs), so they
  * push down and fuse at 100 TB.
  */
object TextOps {

  /** Whitespace tokens of a text column. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish subword split: maximal alphanumeric runs plus every other
    * non-whitespace character as its own token — the standard cheap
    * proxy for a trained tokenizer's token count ("don't" → don/'/t;
    * a CJK character counts as one token). Extraction, not split: the
    * lookaround-split formulation emits bare-whitespace and empty
    * tokens around punctuation, and lookarounds don't exist in RE2 —
    * this pattern runs unchanged on any engine (whitespace spelled as
    * an explicit class: RE2's \s lacks \x0b, Java's has it). Empty or
    * whitespace-only text yields no tokens (unlike [[tokens]]' legacy
    * single-empty-token quirk). */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c,
      lit("[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\u000B\f\r]"), lit(0))

  /** BPE-ish token count — the budget/length axis a token-budget
    * pipeline wants when the real tokenizer is out of reach. */
  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Count occurrences of literal `word` as a whitespace-delimited token.
    * Expressed with replace-length arithmetic so the same SQL shape runs
    * on any engine (used by the DuckDB oracle). */
  def wordCount(c: Column, word: String): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val target = s" $word "
    // overlapping " w1 w2 " patterns: double the spaces so every word is
    // surrounded by its own delimiters
    val spaced = regexp_replace(padded, " ", "  ")
    (length(spaced) - length(regexp_replace(spaced, target.replace(" ", "  "), ""))) /
      lit(target.length * 2 - target.trim.length)
  }

  /** Total ratio: NULL when the denominator is zero (empty text),
    * never a DIVIDE_BY_ZERO — Spark 4 runs ANSI by default, where a
    * bare x/0 THROWS, so one empty document would kill a whole corpus
    * pass. DuckDB's x/0 is NULL, so the guard is also exact oracle
    * parity (the oracle SQL divides unguarded and gets NULL). */
  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num / den)

  /** Ratio of alphabetic chars (single int/int division — deterministic
    * across engines). */
  def alphaRatio(c: Column): Column =
    ratio(length(regexp_replace(c, "[^A-Za-z]", "")), length(c))

  def digitRatio(c: Column): Column =
    ratio(length(regexp_replace(c, "[^0-9]", "")), length(c))

  def punctRatio(c: Column): Column =
    ratio(length(regexp_replace(c, "[^.,;:!?'\"()-]", "")), length(c))

  /** Mean token length. */
  def avgTokenLen(c: Column): Column =
    ratio(length(regexp_replace(c, "\\s+", "")), tokenCount(c))

  /** Stopword ratio against a dictionary (token-level membership). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    ratio(size(filter(tokens(lower(c)), t => t.isin(stopwords: _*))), tokenCount(c))

  /** Composite quality features struct for corpus filtering. */
  def qualityFeatures(c: Column, stopwords: Seq[String] = englishStopwords): Column =
    struct(
      length(c).as("n_chars"),
      tokenCount(c).as("n_tokens"),
      alphaRatio(c).as("alpha_ratio"),
      digitRatio(c).as("digit_ratio"),
      punctRatio(c).as("punct_ratio"),
      avgTokenLen(c).as("avg_token_len"),
      stopwordRatio(c, stopwords).as("stopword_ratio"))

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be")

  /** Per-language stopword seeds for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: language ID at corpus scale is a
    * scoring pass, not a model. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "que", "los"),
    "de" -> Seq("der", "und", "die", "nicht"),
    "fr" -> Seq("le", "les", "des", "est"),
    "zh" -> Seq()) // CJK handled by the codepoint-class score below

  /** Language-ID heuristic: per-language stopword token counts, CJK
    * codepoint density for zh, deterministic argmax (tie order en, es,
    * de, fr, zh). Returns the predicted language code. */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    def score(lang: String): Column = {
      val words = langStopwords(lang)
      if (words.isEmpty) lit(0)
      else size(filter(toks, t => t.isin(words: _*)))
    }
    val zhScore = size(split(c, "[\\u4e00-\\u9fff]")) - 1
    val en = score("en"); val es = score("es"); val de = score("de"); val fr = score("fr")
    when(zhScore > greatest(en, es, de, fr), lit("zh"))
      .when(en >= greatest(es, de, fr), lit("en"))
      .when(es >= greatest(de, fr), lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Whitespace-canonical form used for fingerprinting/exact dedup. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Evaluates `value` ONCE and hands it to `f` as a bound lambda
    * variable. Interpreted higher-order functions re-evaluate every
    * non-lambda subexpression referenced in the lambda body PER
    * ELEMENT (Catalyst does no common-subexpression elimination inside
    * lambda bodies, and HOFs never enter codegen). A token array
    * referenced inside its own transform() therefore re-tokenizes the
    * whole document once per output shingle — O(tokens²) per row. On
    * gate-sized documents (~200 tokens) that hid as a constant factor;
    * the hostile-inputs sweep measured 16+ executor-minutes on ONE
    * 1.2 MB document, which at crawl scale is a hung job. Routing the
    * value through a single-element transform rebinds it as a
    * NamedLambdaVariable: evaluated once, O(1) to read per element. */
  private[ops] def once(value: Column)(f: Column => Column): Column =
    element_at(transform(array(value), f), 1)

  /** The Gopher quality-rule stopwords (Rae et al. 2021, "Scaling
    * Language Models: ...", appendix A — a document must contain at
    * least two of these to pass the rule set). */
  val gopherStopwords: Seq[String] = Seq(
    "the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document-quality signals (Rae et al. 2021 rule set —
    * the standard pre-training corpus filter): word count, mean word
    * length, hash-to-word and ellipsis-to-word ratios (tested
    * SEPARATELY, as the paper does; both `...` and the single-char
    * `…` count as an ellipsis), bullet-line and ellipsis-line
    * fractions, fraction of words with an alphabetic character, and
    * required-stopword hits. Pure codegen'd Column arithmetic over one
    * row — no shuffle, engine-portable.
    *
    * Cross-engine determinism: every ratio is a SINGLE division of two
    * exact integers (the ellipsis ratio scales both sides by 3 so the
    * three-char `...` count never divides separately), so the double
    * is bit-identical on any IEEE engine — which is what puts the
    * whole rule set under the DuckDB oracle gate. Tokens come from
    * `trim(normalized(c))` split on the single collapsed space: the
    * same tokenization as the native gram/packing family (leading
    * tab/newline never fabricates an empty token). Line fractions use
    * raw `\n` lines (structure is a raw-text property; trailing empty
    * lines count, exactly as `split(limit = -1)` keeps them). */
  def gopherSignals(c: Column): Column = {
    val s = trim(normalized(c))
    val toks = split(s, " ")
    val nw = size(toks)
    val lines = split(c, "\n", -1)
    val nl = size(lines)
    val hashChars = length(s) - length(regexp_replace(s, "#", ""))
    // counted independently on s: dot-ellipsis as char-triples,
    // U+2026 as single chars — occurrences = dots/3 + singles, folded
    // into ONE division by scaling both sides by 3
    val dotEllipsisChars = length(s) - length(regexp_replace(s, "\\.\\.\\.", ""))
    val charEllipsis = length(s) - length(regexp_replace(s, "…", ""))
    struct(
      nw.as("n_words"),
      ((length(s) - (nw - 1)) / nw).as("mean_word_len"),
      (hashChars / nw).as("hash_ratio"),
      ((dotEllipsisChars + charEllipsis * 3) / (nw * 3)).as("ellipsis_ratio"),
      (size(filter(lines, l => l.rlike("^[ \t]*[-*•]"))) / nl).as("bullet_frac"),
      // [ \t\r]* BEFORE the anchor: a CRLF corpus leaves \r on every
      // split line, and Java's $ would match before that final \r
      // while RE2's matches only at absolute end — consuming the \r
      // explicitly keeps both engines identical
      (size(filter(lines, l => l.rlike("(\\.\\.\\.|…)[ \t\r]*$"))) / nl).as("ellipsis_frac"),
      (size(filter(toks, t => t.rlike("[a-z]"))) / nw).as("alpha_word_frac"),
      size(array_intersect(toks, array(gopherStopwords.map(lit): _*))).as("stopword_hits"))
  }

  /** The Gopher pass/fail verdict over a [[gopherSignals]] struct
    * column (thresholds are the published defaults). Kept separate so
    * the (7-way-reused) signals struct is computed once as a real
    * column, not re-derived per predicate. */
  def gopherPass(
      g: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWord: Double = 3, maxMeanWord: Double = 10,
      maxHashRatio: Double = 0.1, maxEllipsisRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2): Column =
    g.getField("n_words").between(minWords, maxWords) &&
      g.getField("mean_word_len").between(minMeanWord, maxMeanWord) &&
      g.getField("hash_ratio") <= maxHashRatio &&
      g.getField("ellipsis_ratio") <= maxEllipsisRatio &&
      g.getField("bullet_frac") <= maxBulletFrac &&
      g.getField("ellipsis_frac") <= maxEllipsisFrac &&
      g.getField("alpha_word_frac") >= minAlphaWordFrac &&
      g.getField("stopword_hits") >= minStopwordHits

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Rolling (order-sensitive) 64-bit fingerprint over tokens: each step
    * chains the accumulator into the next token hash. Chained hashing
    * instead of a polynomial accumulator — a `acc * p + h` fold would
    * overflow LongType under ANSI mode (Spark 4 default). */
  def rollingHash(c: Column): Column =
    aggregate(tokens(normalized(c)), lit(0L), (acc, t) => xxhash64(t, acc))

  /** Word n-gram shingles; short texts yield the whole text as the one
    * shingle so every document has a non-empty shingle set. The token
    * array is [[once]]-bound: referencing it directly inside the
    * transform lambda would re-tokenize the document per shingle. */
  def shingles(c: Column, n: Int): Column =
    once(tokens(normalized(c))) { tk =>
      when(size(tk) >= n,
        transform(sequence(lit(0), size(tk) - n),
          i => concat_ws(" ", slice(tk, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", tk)))
    }

  /** Fraction of duplicated word n-grams in the document (0 = no
    * repetition, →1 = the same phrase over and over) — the standard
    * intra-document repetition signal for corpus quality filtering.
    * Texts shorter than `n` tokens score 0; NULL in, NULL out.
    *
    * The distinct-gram count rides the native
    * [[graft.functions.WordNgramHashes]] (one codegen pass) and the
    * total count is arithmetic on the token count — the composable
    * `size(array_distinct(shingles))/size(shingles)` form would build
    * the interpreted gram array twice per row. Both counts are exact
    * integers, so the single division stays bit-identical to the
    * oracle's.
    *
    * The token count comes from the SAME tokenization as the native
    * gram hashes: `tokens(normalized(c))`, whose collapse-then-trim
    * drops the stray empty token that plain `tokenCount` keeps when the
    * text starts or ends with tab/newline (Spark `trim` strips only
    * spaces) — a raw `tokenCount(c)` total would over-count such texts
    * and score unrepeated text > 0. */
  def repetitionRatio(c: Column, n: Int): Column = {
    val tc = size(tokens(normalized(c)))
    val total = when(tc >= n, tc - n + 1).otherwise(lit(1))
    val distinctGrams = size(graft.functions.exprs.word_ngram_hashes(c, n, shortFallback = true))
    when(c.isNull, lit(null).cast("double"))
      .otherwise(lit(1.0) - distinctGrams.cast("double") / total)
  }

  /** The Gopher REPETITION signals (Rae et al. 2021, Table A1 — the
    * other half of the published filter table next to
    * [[gopherSignals]]'s quality rules): per document,
    *   - `dup_line_frac` / `dup_para_frac` — fraction of non-empty
    *     trimmed lines (split on `\n`) / paragraphs (split on `\n\n`)
    *     that are repeats of an earlier identical one:
    *     (n − n_distinct) / n;
    *   - `dup_line_char_frac` / `dup_para_char_frac` — fraction of
    *     those units' characters sitting in the repeat occurrences:
    *     (Σ chars − Σ chars over distinct) / Σ chars;
    *   - `top_{n}gram_char_frac` for each n in `topNs` — characters
    *     claimed by the most frequent word n-gram of the normalized
    *     text (occurrences × n-gram length incl. single joining
    *     spaces) / characters of the normalized text; ties break to
    *     the lexicographically smallest n-gram (deterministic,
    *     engine-portable). Documents with fewer than n words score 0.
    * Gopher's dup-n-gram COVERAGE family (`dup_{5..10}gram_char_frac`
    * — union of covered character intervals) lives in the sibling
    * [[gopherDupNgramSignals]]: it is a pure per-row projection (no
    * explode/aggregate), so fusing it into this function's join tree
    * would put a shuffle under a computation that needs none.
    * Every emitted fraction is a SINGLE division of exact ints, so
    * the doubles are bit-identical cross-engine. NULL text → NULL
    * signals (one row per input row either way).
    *
    * Scale shape: one explode + hash-aggregate pair per unit family
    * (map-side partial combine), a per-(doc, n) `min_by` struct
    * aggregate for the top n-gram — no windows, no driver loops. */
  def gopherRepetitionSignals(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4)): org.apache.spark.sql.DataFrame = {
    require(topNs.nonEmpty && topNs.forall(_ >= 1),
      s"topNs must be non-empty positive, got $topNs")
    Seq("__rid__", "__u__", "__n__", "__g__").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val base = df.select(col(idCol).as("__rid__"), col(textCol).as("__t__"))

    // one (n, n_distinct, chars, dup_chars) row per doc per unit kind
    def unitStats(sep: String, nFrac: String, cFrac: String) = {
      val units = base
        .select(col("__rid__"),
          explode(split(col("__t__"), sep, -1)).as("__u0__"))
        .select(col("__rid__"), trim(col("__u0__")).as("__u__"))
        .filter(length(col("__u__")) > 0)
      units
        .groupBy("__rid__", "__u__").agg(count(lit(1)).as("__c__"))
        .groupBy("__rid__")
        .agg(
          sum(col("__c__")).as("__n__"),
          count(lit(1)).as("__nd__"),
          sum(col("__c__") * length(col("__u__"))).as("__ch__"),
          sum((col("__c__") - 1) * length(col("__u__"))).as("__dch__"))
        .select(col("__rid__"),
          ((col("__n__") - col("__nd__")).cast("double") /
            col("__n__").cast("double")).as(nFrac),
          (col("__dch__").cast("double") / col("__ch__").cast("double"))
            .as(cFrac))
    }
    val lineStats = unitStats("\n", "dup_line_frac", "dup_line_char_frac")
    val paraStats = unitStats("\n\n", "dup_para_frac", "dup_para_char_frac")

    // the most frequent word n-gram's character claim, per n
    val words = base.select(col("__rid__"),
      tokens(normalized(col("__t__"))).as("__w__"),
      length(normalized(col("__t__"))).as("__len__"))
    def topStats(n: Int) = {
      val grams = words
        .select(col("__rid__"), col("__len__"),
          explode(when(size(col("__w__")) >= n,
            transform(sequence(lit(0), size(col("__w__")) - n),
              i => concat_ws(" ", slice(col("__w__"), i + 1, lit(n)))))
            .otherwise(array())).as("__g__"))
      grams
        .groupBy("__rid__", "__len__", "__g__").agg(count(lit(1)).as("__c__"))
        .groupBy("__rid__", "__len__")
        // most frequent, ties to the lexicographically smallest gram:
        // min_by over (-count, gram) is deterministic on both engines
        .agg(min_by(
          struct(col("__c__"), col("__g__")),
          struct((-col("__c__")).as("nc"), col("__g__"))).as("__top__"))
        .select(col("__rid__"),
          ((col("__top__.__c__") * length(col("__top__.__g__")))
            .cast("double") / col("__len__").cast("double"))
            .as(s"top_${n}gram_char_frac"))
    }

    val joined = topNs.foldLeft(
      base.join(lineStats, Seq("__rid__"), "left")
        .join(paraStats, Seq("__rid__"), "left")) { (acc, n) =>
      acc.join(topStats(n), Seq("__rid__"), "left")
    }
    val outCols = Seq("dup_line_frac", "dup_line_char_frac",
      "dup_para_frac", "dup_para_char_frac") ++
      topNs.map(n => s"top_${n}gram_char_frac")
    // empty-gram docs (fewer than n words) score 0, not NULL — but a
    // NULL text stays NULL across every signal
    joined.select(
      col("__rid__").as(idCol) +:
        outCols.map(c =>
          when(col("__t__").isNull, lit(null).cast("double"))
            .otherwise(coalesce(col(c), lit(0.0))).as(c)): _*)
  }

  /** Gopher duplicate-n-gram character-coverage fractions (Rae et al.
    * 2021, Table A1's `dup_{5..10}gram_char_frac` family — the last
    * of the published repetition signals): per document and per n in
    * `ns`, the fraction of the normalized text's characters lying
    * inside at least one occurrence of a word n-gram that appears 2+
    * times — the UNION of the duplicated grams' character intervals,
    * so overlapping occurrences never double-count. Gram identity is
    * exact string equality over [[tokens]] of [[normalized]] text
    * (the family's shared tokenization); the denominator is the
    * normalized length; each fraction is one division of exact longs
    * (bit-identical cross-engine). Documents with fewer than n words
    * score 0; NULL text → NULL (an array, so every per-n signal).
    *
    * Scale shape: ONE native codegen'd expression computes every n in
    * a single pass over the token array
    * ([[graft.functions.DupNgramCharFracs]]) — a pure projection, no
    * explode, no aggregate, no shuffle; the per-row cost is O(words·n)
    * in gram bytes, the shape that survives a 100 TB corpus because
    * it parallelizes embarrassingly with the scan. */
  def dupNgramCharFracs(c: Column, ns: Seq[Int]): Column = {
    require(ns.nonEmpty && ns.forall(_ >= 2),
      s"ns must be non-empty with every n >= 2, got $ns")
    when(c.isNull, lit(null).cast("array<double>"))
      .otherwise(graft.functions.spanExprs.dup_ngram_char_fracs(
        tokens(normalized(c)), ns))
  }

  /** One `dup_{n}gram_char_frac` column per n — the wide form of
    * [[dupNgramCharFracs]], mirroring [[gopherRepetitionSignals]]'
    * output shape. The shared array is materialized once per row and
    * the per-n columns are element reads (whole-stage codegen's
    * subexpression elimination keeps the expensive expression single
    * — the [[gopherPass]] struct discipline). */
  def gopherDupNgramSignals(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = 5 to 10): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains("__f__"),
      "input already has a column named __f__")
    df.select(col(idCol), dupNgramCharFracs(col(textCol), ns).as("__f__"))
      .select(col(idCol) +: ns.zipWithIndex.map { case (n, i) =>
        element_at(col("__f__"), i + 1).as(s"dup_${n}gram_char_frac")
      }: _*)
  }

  /** Keep only documents passing Gopher's repetition thresholds —
    * the COMPLETE published set (Rae et al. 2021 Table A1): dup lines
    * ≤ 0.30, dup paragraphs ≤ 0.30, dup line/paragraph chars ≤ 0.20,
    * top 2/3/4-gram chars ≤ 0.20/0.18/0.16, and duplicate 5..10-gram
    * character coverage ≤ 0.15/0.14/0.13/0.12/0.11/0.10. Signals are
    * computed by [[gopherRepetitionSignals]] /
    * [[gopherDupNgramSignals]] and dropped again; NULL-text rows
    * fail (no text, no pass — matching gopherPass). The per-n
    * thresholds are positional over `topNs = (2, 3, 4)` and
    * `dupNs = (5..10)`. The coverage rules run as a plain filter on
    * the aggregate rules' survivors — the projection-only signal
    * costs nothing on rows the cheap rules already rejected. */
  def gopherRepetitionFilter(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxDupLineFrac: Double = 0.30, maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20, maxDupParaCharFrac: Double = 0.20,
      maxTopGramCharFrac: Seq[Double] = Seq(0.20, 0.18, 0.16),
      maxDupGramCharFrac: Seq[Double] =
        Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)): org.apache.spark.sql.DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = 5 to 10
    require(!df.columns.contains("__f__"),
      "input already has a column named __f__")
    require(maxTopGramCharFrac.length == topNs.length,
      s"maxTopGramCharFrac must give one threshold per n in $topNs")
    require(maxDupGramCharFrac.length == dupNs.length,
      s"maxDupGramCharFrac must give one threshold per n in $dupNs")
    val sig = gopherRepetitionSignals(df.select(col(idCol), col(textCol)),
      idCol, textCol, topNs)
    val pass = sig.filter(
      col("dup_line_frac") <= maxDupLineFrac &&
        col("dup_para_frac") <= maxDupParaFrac &&
        col("dup_line_char_frac") <= maxDupLineCharFrac &&
        col("dup_para_char_frac") <= maxDupParaCharFrac &&
        topNs.zip(maxTopGramCharFrac).map { case (n, t) =>
          col(s"top_${n}gram_char_frac") <= t
        }.reduce(_ && _))
      .select(col(idCol))
    df.join(pass, Seq(idCol), "left_semi")
      .withColumn("__f__", dupNgramCharFracs(col(textCol), dupNs))
      .filter(dupNs.indices.map(i =>
        element_at(col("__f__"), i + 1) <= maxDupGramCharFrac(i))
        .reduce(_ && _))
      .drop("__f__")
  }

  /** Document-term TF-IDF over whitespace tokens of the normalized
    * text: one row per (doc, term) with the raw term frequency, the
    * document frequency, and smoothed tf-idf
    * `tf · (ln((N+1)/(df+1)) + 1)` (the standard add-one smoothing —
    * terms in every document still score > 0).
    *
    * Scale shape: explode → two hash aggregates (map-side partial
    * combine) → equi-join tf with the term dictionary on `term`; the
    * corpus size N arrives via a one-row broadcast cross join so the
    * whole computation stays in ONE lazy plan (no driver count).
    * tfidf is rounded to 6 decimals: ln is a transcendental whose last
    * ulp is not guaranteed identical across engines/libms, and the
    * rounding implementations themselves differ (Spark rounds doubles
    * through exact BigDecimal, DuckDB in floating point) — at 6
    * decimals an ulp-level ln difference lands on a rounding boundary
    * with probability ~1e-9 per value, vs a materially risky ~1e-6 at
    * 9 decimals. */
  def tfIdf(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(normalized(col(textCol)))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = broadcast(df.agg(count(lit(1)).as("__n__")))
    tf.join(dfreq, "term")
      .crossJoin(n)
      .withColumn("tfidf",
        round(col("tf") * (log((col("__n__") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Corpus-level boilerplate LINE removal (the CCNet / RefinedWeb
    * paragraph-dedup step): a line whose normalized form occurs in at
    * least `minDocs` DISTINCT documents is boilerplate (nav text,
    * cookie banners, copyright footers) and is dropped from EVERY
    * document. Blank lines are document structure, not boilerplate —
    * always kept. Returns `df` with `textCol` rebuilt, line order
    * preserved; a document whose every line was boilerplate becomes
    * the empty string.
    *
    * Scale shape: posexplode to (doc, pos, line) → distinct-doc count
    * per line hash (hash aggregate with map-side partials — boilerplate
    * lines are by definition high-frequency, but the aggregate carries
    * only (hash, count), never a doc list) → anti-join the boilerplate
    * keys → one groupBy(doc) rebuild via
    * array_sort(collect_list(struct(pos, line))): per-DOC arrays,
    * never corpus-sized, and no window sort anywhere. Line identity is
    * xxhash64 of the normalized line (the oracle joins the normalized
    * strings themselves — equal absent a 64-bit collision).
    *
    * The line explode is DELIBERATELY evaluated twice (once under the
    * frequency aggregate, once as the anti-join probe): split+hash is
    * cheap pipelined per-row work, while persisting a corpus-sized
    * line table to make it single-pass would write and re-read the
    * whole corpus through the block store — strictly worse at scale.
    * This is the standard two-pass shape of CCNet-style paragraph
    * dedup. (The small boilerplate KEY set is what the second pass
    * joins against; AQE broadcasts it when it measures small.) */
  def removeBoilerplateLines(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      minDocs: Int): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df
      .select(col(idCol).as("__bid__"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos__", "__line__")))
      .withColumn("__k__", xxhash64(normalized(col("__line__"))))
    val boiler = lines
      .filter(!col("__line__").rlike("^\\s*$"))
      .groupBy("__k__").agg(count_distinct(col("__bid__")).as("__nd__"))
      .filter(col("__nd__") >= minDocs)
      .select("__k__")
    // blank lines survive the anti-join by construction: they are
    // excluded from the boilerplate count, and no non-blank line
    // normalizes to a blank's normalized form
    val kept = lines.join(boiler, Seq("__k__"), "left_anti")
    val rebuilt = kept.groupBy("__bid__")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos__"), col("__line__")))),
          s => s.getField("__line__"))).as("__clean__"))
    // NULL text stays NULL (consistent with repetitionRatio); the
    // empty-string fallback is only for docs whose every line was
    // removed (their group vanished from the rebuild)
    df.join(rebuilt, col(idCol) === col("__bid__"), "left")
      .withColumn(textCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean__"), lit(""))))
      .drop("__bid__", "__clean__")
  }

  /** The C4 policy-boilerplate substrings (Raffel et al. 2020, the
    * tensorflow_datasets c4_utils constants): a line mentioning any of
    * these is cookie/policy chrome, not content. */
  val c4PolicySubstrings: Seq[String] = Seq(
    "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies")

  /** C4's per-LINE keep verdict (Raffel et al. 2020 §2.2): the line
    * (trimmed) must end in a terminal mark (`. ! ? "`), must NOT end
    * in an ellipsis, must carry at least `minWords` whitespace words,
    * and must mention neither "javascript" nor any
    * [[c4PolicySubstrings]] entry (case-insensitive). Pure codegen'd
    * string ops — engine-portable (the oracle replays it verbatim).
    * The word separator is the EXPLICIT class `[ \t\n\x0b\f\r]+`, not
    * `\s+`: RE2's `\s` excludes vertical tab while Java's includes
    * it, so `\s` would diverge cross-engine on any \x0b-bearing line
    * (same discipline as the normalized/gopher oracles). */
  def c4KeepLine(l: Column, minWords: Int = 5): Column = once(trim(l)) { t =>
    once(lower(t)) { low =>
      t.rlike("[.!?\"]$") && !t.rlike("\\.\\.\\.$") &&
        (size(split(t, "[ \\t\\n\\x0b\\f\\r]+")) >= minWords) &&
        !low.contains("javascript") &&
        c4PolicySubstrings.map(p => !low.contains(p)).reduce(_ && _)
    }
  }

  /** C4 page+line cleanup (Raffel et al. 2020 §2.2): lines failing
    * [[c4KeepLine]] are dropped and the page rebuilt from the
    * survivors in order; then the PAGE itself is dropped when its
    * ORIGINAL text mentions "lorem ipsum" or contains `{` (code, not
    * prose), or when the cleaned text keeps fewer than `minSentences`
    * sentences — C4 counts nltk sentences; this counts terminal marks
    * (`[.!?]`) in the cleaned text, a documented deviation that needs
    * no model file and replays in any SQL engine. NULL-text pages
    * drop (no sentences).
    *
    * Scale shape: the line verdicts are codegen'd predicates under a
    * posexplode (no interpreted higher-order filter in the hot path —
    * the WordNgramHashes lesson), and the rebuild is ONE hash
    * aggregation on the id; page predicates are a plain filter. */
  def c4Clean(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minSentences: Int = 3): org.apache.spark.sql.DataFrame = {
    Seq("__cid__", "__pos__", "__line__", "__clean__").foreach(c =>
      require(!df.columns.contains(c), s"input already has a column named $c"))
    val lines = df
      .select(col(idCol).as("__cid__"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos__", "__line__")))
      .filter(c4KeepLine(col("__line__"), minWords))
    val rebuilt = lines.groupBy("__cid__")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos__"), col("__line__")))),
          s => s.getField("__line__"))).as("__clean__"))
    df.join(rebuilt, col(idCol) === col("__cid__"), "left")
      .withColumn("__clean__", coalesce(col("__clean__"), lit("")))
      .filter(
        !lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{") &&
          size(regexp_extract_all(col("__clean__"), lit("[.!?]"), lit(0)))
            >= minSentences)
      .withColumn(textCol, col("__clean__"))
      .drop("__cid__", "__clean__")
  }

  /** Token-budget document chunking (context-window preprocessing):
    * split each document into chunks of at most `maxTokens` whitespace
    * tokens of the normalized text, consecutive chunks sharing
    * `overlap` tokens. Chunk i covers tokens
    * [i·stride, i·stride + maxTokens) with stride = maxTokens −
    * overlap; every token is covered, and a document of ≤ `maxTokens`
    * tokens yields exactly one chunk. Returns one row per chunk:
    * (`idCol`, chunk_id, chunk_text, n_chunk_tokens). A NULL text
    * yields NO chunks (the generator drops the row) — filter or
    * default NULLs upstream if every document must survive.
    *
    * Scale shape: the token array and chunk array are materialized in
    * a projection BELOW the generator, so posexplode's child is a bare
    * attribute (no per-output-row re-evaluation — the WordNgramHashes
    * lesson); everything is codegen'd Column arithmetic, no UDFs, no
    * shuffle. */
  def chunkDocuments(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap for maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    // nChunks = ceil((n - maxTokens) / stride) + 1 for n > maxTokens,
    // folded to one floor: (n - maxTokens + 2·stride - 1) div stride
    // (double division then int cast truncates = floor for the
    // non-negative numerator this branch guarantees).
    // token array / count / chunk count are once-bound as lambda
    // variables (r21; the [[once]] rebinding chunkDocumentsByCost
    // already uses): the withColumn chain COLLAPSES into one
    // projection, and each reference of __n__/__tk__ would otherwise
    // re-evaluate the whole tokens(normalized(text)) pass per row
    val chunksCol = once(tokens(normalized(col(textCol)))) { tk =>
      once(size(tk)) { n =>
        once(when(n <= maxTokens, lit(1))
          .otherwise(((n - maxTokens + lit(2 * stride - 1)) / lit(stride)).cast("int"))) { nc =>
          transform(sequence(lit(0), nc - 1), i => struct(
            concat_ws(" ", slice(tk, i * stride + 1, lit(maxTokens))).as("chunk_text"),
            least(lit(maxTokens), n - i * stride).as("n_chunk_tokens")))
        }
      }
    }
    // CONDITIONAL keyed spread below the (heavy) tokenize+chunk
    // projection (r22; see Par.spreadNarrow): chunking is pure per-row
    // work, so a narrow input (one small file / one parquet row group)
    // would run the whole pass in one task — but a scan that is
    // already parallel must NOT pay a full shuffle of the corpus for a
    // map-only operator (the 100 TB no-shuffle contract,
    // PlanAuditSpec). r21's unconditional repartition violated that
    // contract; the spread now fires only when the planner says the
    // input parallelism is under a quarter of the target.
    val base = Par.spreadNarrow(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), chunksCol.as("__chunks__"))
    base
      .select(col(idCol), posexplode(col("__chunks__")).as(Seq("chunk_id", "__c__")))
      .select(col(idCol), col("chunk_id"),
        col("__c__.chunk_text").as("chunk_text"),
        col("__c__.n_chunk_tokens").as("n_chunk_tokens"))
  }

  /** Token-budget chunking under an ARBITRARY per-word cost — the
    * real-tokenizer sibling of [[chunkDocuments]] (which budgets in
    * whitespace tokens): greedy word-fill, where a word joins the
    * current chunk unless its cost would push the chunk past
    * `maxTokens`, in which case it starts the next chunk. A single
    * word costlier than `maxTokens` gets a chunk of its own (the
    * standard greedy rule — a hard per-chunk bound cannot split a
    * word). Words are the RAW whitespace split (the tokenizer's own
    * word boundary), so per-doc chunk costs sum exactly to the
    * document's total token cost. No overlap — overlap in
    * variable-cost units is ill-defined. Returns one row per chunk:
    * (`idCol`, chunk_id, chunk_text, n_chunk_tokens); a document with
    * no words yields ONE empty chunk (matching [[chunkDocuments]]'s
    * ≤-budget-is-one-chunk rule); a NULL text yields NO chunks.
    *
    * Scale shape: per-row Column arithmetic, no UDFs, no shuffle —
    * per-doc work is O(words): the greedy scan is ONE native pass
    * ([[graft.functions.GreedyChunkStarts]] — a Catalyst `aggregate`
    * fold cannot hold the boundary list linearly: an array-append
    * accumulator re-copies per step, O(words²) element copies, which
    * a single multi-MB crawl document turns into a task-killing
    * straggler; ChunkFoldScaleSpec pins the linear wall-time), and
    * the rebuild slices CONTIGUOUS word ranges per chunk. The
    * word/cost/starts arrays are bound as lambda variables via
    * [[once]]: chained projections COLLAPSE, and an attribute
    * referenced k times in the collapsed projection would re-evaluate
    * its whole defining expression — including the per-word cost
    * pass — k times per row (measured: ~50x slower on the gate corpus
    * before the rebinding). The per-word cost is kept per-word on
    * purpose — a split-the-full-stream-at-markers shortcut miscounts
    * words whose raw characters spell the marker. */
  def chunkDocumentsByCost(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxTokens: Int, costOf: Column => Column): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val wordsExpr = filter(
      split(trim(col(textCol)), "[ \t\n\u000B\f\r]+"), w => length(w) > 0)
    val chunksExpr = once(wordsExpr) { words =>
      once(transform(words, w => costOf(w).cast("int"))) { costs =>
        // the greedy scan: 1-based chunk-start indices in one native
        // O(words) pass with an O(chunks) accumulator. A word
        // overflows — starting a new chunk — iff the chunk already
        // holds something and adding it would exceed the budget, so an
        // oversized word still lands somewhere (alone). Chunks are
        // CONTIGUOUS word ranges, so the rebuild slices per chunk.
        once(graft.functions.chunkExprs.greedy_chunk_starts(
          costs, maxTokens)) { starts =>
          when(size(words) === 0,
            array(struct(lit("").as("chunk_text"), lit(0).as("n_chunk_tokens"))))
            .otherwise(transform(sequence(lit(0), size(starts) - 1), c => {
              val start = element_at(starts, c + 1)
              val end = when(c + 1 < size(starts), element_at(starts, c + 2) - 1)
                .otherwise(size(words))
              val len = (end - start + 1).cast("int")
              struct(
                concat_ws(" ", slice(words, start, len)).as("chunk_text"),
                aggregate(slice(costs, start, len),
                  lit(0), (a, x) => a + x).as("n_chunk_tokens"))
            }))
        }
      }
    }
    // conditional keyed spread below the heavy greedy-chunk
    // projection — same rationale as chunkDocuments (r22,
    // Par.spreadNarrow: only when the input scan is too narrow to
    // parallelize; never an unconditional corpus shuffle)
    Par.spreadNarrow(
      df.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)),
      col(idCol))
      .select(col(idCol), chunksExpr.as("__chunks__"))
      .select(col(idCol), posexplode(col("__chunks__")).as(Seq("chunk_id", "__ch__")))
      .select(col(idCol), col("chunk_id"),
        col("__ch__.chunk_text").as("chunk_text"),
        col("__ch__.n_chunk_tokens").as("n_chunk_tokens"))
  }

  /** Corpus text cleaning: Unicode NFC composition (composed and
    * decomposed renderings of the same text must fingerprint/dedup
    * identically — [[graft.functions.NfcNormalize]]), C0/C1 control
    * characters stripped (tab/newline/CR become spaces first so word
    * boundaries survive), then whitespace runs collapsed and trimmed.
    * Case is PRESERVED — this is cleanup, not canonicalization; chain
    * [[normalized]] after it for fingerprinting. */
  def cleanText(c: Column): Column = {
    val composed = graft.functions.exprs.nfc_normalize(c)
    val spaced = regexp_replace(composed, "[\\t\\n\\r]", " ")
    val stripped = regexp_replace(spaced, "[\\p{Cntrl}\\x{0080}-\\x{009F}]", "")
    trim(regexp_replace(stripped, " +", " "))
  }

  /** Mojibake repair ([[graft.functions.FixMojibake]] — ftfy-style):
    * UTF-8 text that was mis-decoded as windows-1252/latin-1 upstream
    * ("cafÃ©", â€™-class artifacts) is detected by the
    * reinterpretation test and restored; clean text — including
    * legitimate accented text — passes through unchanged, ASCII on a
    * zero-allocation fast path. Chain BEFORE [[cleanText]]: repair
    * wants the artifacts intact, and cleanText strips the C1 controls
    * some artifact bytes decode to. */
  def fixMojibake(c: Column): Column =
    graft.functions.mojibakeExprs.fix_mojibake(c)

  /** Engine-portable PII patterns: deliberately plain regex (no
    * lookaround, no backrefs) so the same pattern string runs
    * identically on Java regex and RE2-family engines — redaction must
    * be reproducible by whatever audits the output corpus. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Replace every match of `pattern` with `token`. */
  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  /** Count of matches of `pattern` (for redaction accounting). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Scrub emails then phone numbers — the standard corpus privacy
    * pass. Pure codegen'd regexp_replace chain, no UDFs. */
  def redactPii(c: Column): Column =
    redact(redact(c, emailPattern, "<EMAIL>"), phonePattern, "<PHONE>")

  /** Word n-gram shingles WITHOUT the short-text fallback: a text with
    * fewer than `n` tokens yields an EMPTY set. This is the right
    * semantics for overlap tests ([[Contamination]]): a document
    * shorter than the n-gram cannot contain one, whereas the
    * [[shingles]] fallback would let two unrelated short snippets
    * "overlap" on their whole text. */
  def strictShingles(c: Column, n: Int): Column =
    once(tokens(normalized(c))) { tk =>
      when(size(tk) >= n,
        transform(sequence(lit(0), size(tk) - n),
          i => concat_ws(" ", slice(tk, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Character n-gram shingles, enumerated by ONE linear regex pass:
    * `(?s)(?=(.{n})).` captures the n chars starting at every position
    * (the lookahead captures without consuming; the final `.` advances
    * one codepoint), yielding exactly the positions 0..len-n substring
    * enumeration. NOT per-position `substr`: `UTF8String.substring`
    * seeks its start codepoint by scanning from byte 0, so the
    * transform-over-positions formulation is O(chars²) PER ROW — the
    * hostile-inputs sweep measured 12+ executor-minutes on one 1.2 MB
    * document (r8's `once` fix removed the re-normalization quadratic
    * but not this seek quadratic). `(?s)` so line separators
    * (U+0085/U+2028/U+2029 survive [[normalized]], whose \s excludes
    * them) still match `.` — same identity as the substring version.
    * [[once]]-bound so interpreted contexts don't re-normalize per
    * reference. */
  def charShingles(c: Column, n: Int): Column =
    once(normalized(c)) { s =>
      when(length(s) >= n,
        regexp_extract_all(s, lit(s"(?s)(?=(.{$n}))."), lit(1)))
        .otherwise(array(s))
    }
}
