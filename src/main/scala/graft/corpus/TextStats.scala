package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis columns for corpus pipelines: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting. All pure
  * codegen'd expressions — they run inside the scan's WholeStageCodegen
  * span, no shuffle, no UDF.
  */
object TextStats {

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  private def toks(text: Column): Column = split(text, " ")

  /** Fraction of whitespace tokens that are English stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val t = toks(text)
    size(filter(t, x => x.isin(stopwords: _*)))
      .cast("double") / size(t).cast("double")
  }

  /** n-gram heuristic language ID, binary en/unknown form: English iff the
    * stopword ratio and an ASCII-letter ratio clear thresholds. The
    * multi-class variant is [[langId]].
    */
  def isEnglish(text: Column, minStopRatio: Double = 0.05): Column =
    stopwordRatio(text) >= minStopRatio &&
      (length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double") /
        length(text).cast("double")) >= 0.9

  /** Marker function-word sets for the Latin-script languages [[langId]]
    * scores (distinctive high-frequency words; overlaps are fine — the
    * argmax decides). */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with", "you", "have"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans", "je", "vous"),
    "es" -> Seq("el", "los", "y", "es", "para", "con", "una", "por", "no", "se"),
    "it" -> Seq("il", "di", "che", "per", "non", "sono", "della", "anche", "più", "come"))

  /** Unicode script ranges checked BEFORE the marker argmax (a CJK text has
    * no whitespace tokens to score). Kana outranks Han because Japanese
    * text mixes kanji; order in this list is the check order. */
  val ScriptRanges: Seq[(String, Char, Char)] = Seq(
    ("ja", '\u3040', '\u30ff'), // hiragana + katakana
    ("zh", '\u4e00', '\u9fff'), // CJK unified
    ("ko", '\uac00', '\ud7af'), // hangul
    ("ru", '\u0400', '\u04ff'), // cyrillic
    ("ar", '\u0600', '\u06ff')) // arabic

  /** Multi-class language ID, pure codegen (scan-stage expression, no
    * shuffle / UDF): script-range character ratios pick the non-Latin
    * languages; Latin text scores one marker set per language and takes
    * the argmax (ties break to the lexicographically LARGEST code via the
    * struct array_max — deterministic). Below `minHits` marker hits →
    * "unknown". At 100 TB this is one WholeStageCodegen pass over text.
    */
  def langId(text: Column, minHits: Int = 2): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", "")).cast("double")
    def scriptRatio(lo: Char, hi: Char): Column = {
      val kept = length(regexp_replace(text, s"[^$lo-$hi]", "")).cast("double")
      when(nonSpace > 0, kept / nonSpace).otherwise(lit(0.0))
    }
    val t = split(lower(text), " ")
    val scores = array(LanguageMarkers.map { case (code, ms) =>
      struct(size(filter(t, x => x.isin(ms: _*))).as("s"), lit(code).as("c"))
    }: _*)
    val best = array_max(scores)
    val latin = when(best("s") >= minHits, best("c")).otherwise(lit("unknown"))
    ScriptRanges.foldRight(latin) { case ((code, lo, hi), acc) =>
      when(scriptRatio(lo, hi) > 0.3, lit(code)).otherwise(acc)
    }
  }

  /** Quality score ∈ [0,1]: penalizes very short docs, high punctuation
    * density, and degenerate (low type/token ratio) texts — the standard
    * pretraining-filter shape (length/punct/diversity ratios).
    */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val punct = length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double")
    val punctScore = greatest(lit(0.0), lit(1.0) - punct * 5.0 / length(text).cast("double"))
    val diversity = size(array_distinct(t)).cast("double") / nTok
    // no rounding here: keep the raw IEEE double (engine-portable; rounding
    // modes differ between engines, downstream consumers round for display)
    (lenScore + punctScore + least(diversity * 2.0, lit(1.0))) / 3.0
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(toks(text))

  /** BPE-ish token estimate: count of matches of a GPT-style pre-tokenizer
    * regex (letter runs, digit runs, single punctuation), each letter run
    * costing ceil(len/4) subword units.
    */
  def bpeTokenEstimate(text: Column): Column = {
    val pieces = regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))
    aggregate(pieces, lit(0),
      (acc, p) => acc + ceil(length(p).cast("double") / 4.0).cast("int"))
  }

  /** Repetition-based quality signals (Gopher/MassiveText rule family):
    * duplicate line/paragraph fractions (count + char), top-{2,3,4}-gram
    * char fractions, duplicated-{5..10}-gram coverage char fractions — a
    * struct of 13 doubles from ONE scan-stage pass per row (see
    * [[graft.functions.RepetitionStats]] for the exact definitions). The
    * standard pretraining repetition filter gates on these
    * (e.g. dup_line_frac > 0.3 or top_2gram_char_frac > 0.2 → drop).
    */
  def repetition(text: Column): Column =
    graft.functions.GraftFunctions.repetition_stats(text)

  /** The published Gopher repetition GATE (Rae et al. 2021 Table A1) over
    * [[repetition]]'s signal struct — the conjunctive pass completing the
    * rule family the signals feed: dup line/para fractions ≤ 0.30, their
    * char fractions ≤ 0.20, top-{2,3,4}-gram ≤ {0.20, 0.18, 0.16},
    * dup-{5..10}-gram coverage ≤ {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}. */
  def repetitionPass(r: Column): Column = {
    val topCaps = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupCaps = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    (r.getField("dup_line_frac") <= 0.30 && r.getField("dup_para_frac") <= 0.30 &&
      r.getField("dup_line_char_frac") <= 0.20 &&
      r.getField("dup_para_char_frac") <= 0.20) &&
      topCaps.map { case (n, c) => r.getField(s"top_${n}gram_char_frac") <= c }
        .reduce(_ && _) &&
      dupCaps.map { case (n, c) => r.getField(s"dup_${n}gram_char_frac") <= c }
        .reduce(_ && _)
  }

  /** Gopher's non-repetition stopword list (Rae et al. 2021 §A1.1): a doc
    * must contain ≥2 of these to pass the composite filter. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Composite Gopher quality-rule signals (Rae et al. 2021 Table A1, the
    * non-repetition subset — repetition gates live in [[repetition]]): word
    * count, mean word length, symbol-to-word ratio (`#`/`...`), bullet-start
    * and ellipsis-end line fractions, fraction of words with ≥1 alphabetic
    * char, Gopher-stopword hits, and the conjunctive `pass`. One struct of
    * builtins — evaluates inside the scan's WholeStageCodegen span. Words
    * split on `\s+` (line-bearing text), lines on `\n`.
    *
    * Published gates: 50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10, symbol ratio
    * ≤ 0.1, bullet lines ≤ 0.9, ellipsis lines ≤ 0.3, alpha-word fraction
    * ≥ 0.8, stopword hits ≥ 2.
    */
  def gopherQuality(text: Column): Column = {
    val words = split(text, "\\s+")
    val nWords = size(words).cast("double")
    val meanLen = aggregate(words, lit(0L), (a, w) => a + length(w)).cast("double") / nWords
    val nHash = size(regexp_extract_all(text, lit("#"), lit(0))).cast("double")
    val nEllipsis = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0))).cast("double")
    val symbolRatio = (nHash + nEllipsis) / nWords
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines, l => l.endsWith("..."))).cast("double") / nLines
    val alphaFrac = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") / nWords
    val stopHits = size(filter(transform(words, w => lower(w)),
      w => w.isin(GopherStopwords: _*))).cast("long")
    val pass = nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2
    struct(
      nWords.cast("long").as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"), alphaFrac.as("alpha_word_frac"),
      stopHits.as("stopword_hits"), pass.as("pass"))
  }

  /** C4 cleaning rules (Raffel et al. 2020 §2.2, the "Colossal Clean
    * Crawled Corpus" line+page filters) as one scan-stage struct — the
    * line-level companion to the page-level [[gopherQuality]] gate:
    *
    * Line rules (a line survives iff ALL hold):
    *  - ends, after right-trim, in terminal punctuation `. ! ?` or a
    *    closing double quote;
    *  - has ≥ 3 whitespace-delimited words;
    *  - does not contain the word "javascript" (case-insensitive substring
    *    — C4 drops cookie/JS boilerplate lines).
    *
    * Page rules (on the ORIGINAL text, flags in the struct):
    *  - `has_lorem_ipsum`: lowercased text contains "lorem ipsum";
    *  - `has_brace`: text contains `{` (code, not prose);
    *  - `has_bad_word`: any of `badWords` matches at word boundaries
    *    (C4's public blocklist is substituted by a caller-supplied list;
    *    words must be plain `[a-z0-9]+` — they are spliced into a portable
    *    regex);
    *  - `pass`: ≥ 5 sentences in the CLEANED text (sentence ≈ one `[.!?]`
    *    mark, C4's heuristic) and none of the three page flags.
    *
    * `clean_text` is the surviving lines re-joined with `\n` — empty (not
    * null) when nothing survives. Pure builtins: runs inside the scan's
    * WholeStageCodegen span, no shuffle, no UDF.
    */
  def c4(text: Column, badWords: Seq[String] = Nil): Column = {
    badWords.foreach(w => require(w.matches("[a-z0-9]+"),
      s"badWords must be plain lowercase words (spliced into a regex): '$w'"))
    val lines = split(text, "\n")
    def words(l: Column): Column =
      when(length(trim(l)) === 0, lit(0)).otherwise(size(split(trim(l), "\\s+")))
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") && words(l) >= 3 &&
        !contains(lower(l), lit("javascript")))
    val clean = array_join(kept, "\n")
    val nSent = size(regexp_extract_all(clean, lit("[.!?]"), lit(0)))
    val hasLorem = contains(lower(text), lit("lorem ipsum"))
    val hasBrace = contains(text, lit("{"))
    val hasBad =
      if (badWords.isEmpty) lit(false)
      else lower(text).rlike(badWords.mkString("\\b(?:", "|", ")\\b"))
    val pass = nSent >= 5 && !hasLorem && !hasBrace && !hasBad
    struct(clean.as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept"),
      nSent.cast("long").as("n_sentences"),
      hasLorem.as("has_lorem_ipsum"), hasBrace.as("has_brace"),
      hasBad.as("has_bad_word"), pass.as("pass"))
  }

  /** Per-source corpus DATASHEET — the audit table a mixing/curation step
    * reads before deciding rates ("Datasheets for Datasets", Gebru et al.
    * 2021, the quantitative rows): per source (language, domain, crawl id —
    * any bounded grouping) the document count, total/mean whitespace
    * tokens, the fraction passing a caller-supplied quality gate, and the
    * exact-duplicate ratio (1 − distinct content hashes / docs).
    *
    * One hash aggregate — every measure is map-side combinable (count, long
    * sum, 0/1 sum, distinct-count), and the derived doubles are single
    * divisions of exact integers, so any engine reproduces them bit-for-bit
    * (no cross-row double sums). At 100 TB this is one pass over the scan
    * with a bounded-cardinality group key.
    */
  def datasheet(
      docs: DataFrame, source: Column, words: Column,
      quality: Column, contentHash: Column): DataFrame =
    docs
      .select(source.as("source"), words.cast("long").as("__w"),
        quality.cast("int").as("__q"), contentHash.as("__ch"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("total_words"),
        sum(col("__q")).as("__nq"),
        countDistinct(col("__ch")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("total_words"),
        (col("total_words").cast("double") / col("n_docs")).as("mean_words"),
        (col("__nq").cast("double") / col("n_docs")).as("quality_rate"),
        col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_docs")).as("dup_ratio"))

  /** Document fingerprint: the minimum seeded md5 over word 3-shingles — a
    * 1-hash MinHash, stable under shingle reordering; docs sharing a
    * fingerprint are near-dup candidates (winnowing's min-sampling step).
    */
  def fingerprint(text: Column, k: Int = 3): Column = {
    val sh = Dedup.shingles(text, k)
    when(size(sh) > 0, array_min(transform(sh, s => md5(concat(lit("fp:"), s)))))
      .otherwise(md5(concat(lit("fp:"), text)))
  }

  /** Sentence segmentation, lookaround-free (RE2-portable): a sentence is
    * a maximal run of non-terminators followed by one-or-more `.!?` —
    * `regexp_extract_all` of `[^.!?]+[.!?]+` — plus the unterminated tail
    * as a final sentence. Declared subset: abbreviation periods ("Dr.")
    * split like sentence ends (a guard needs lookbehind, which RE2 lacks
    * — the oracle-portability rule wins). Whitespace-trimmed, empties
    * dropped. */
  def sentences(text: Column): Column = {
    val terminated = regexp_extract_all(text, lit("[^.!?]+[.!?]+"), lit(0))
    val tail = trim(regexp_extract(text, "([^.!?]+)$", 1))
    val all = when(tail === "", terminated)
      .otherwise(concat(terminated, array(tail)))
    filter(transform(all, s => trim(s)), s => s =!= "")
  }

  /** Flesch–Kincaid grade level + the counts behind it — the readability
    * band edu-quality filters (FineWeb-Edu-shaped) cut on. Syllables are
    * estimated as vowel GROUPS per word (the standard cheap estimator,
    * identical regex both engines); grade = 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59 with every operand a single division
    * of exact integers. Returns struct(n_sentences, n_words,
    * n_syllables, fk_grade); texts with no words grade NULL. */
  def readability(text: Column): Column = {
    val sents = sentences(text)
    val nSent = greatest(size(sents), lit(1)).cast("long")
    val words = filter(split(text, "[^A-Za-z']+"), w => w =!= "")
    val nWords = size(words).cast("long")
    val nSyll = aggregate(words, lit(0L), (acc, w) =>
      acc + greatest(size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))),
        lit(1)).cast("long"))
    val grade = lit(0.39) * (nWords.cast("double") / nSent.cast("double")) +
      lit(11.8) * (nSyll.cast("double") / nWords.cast("double")) - lit(15.59)
    struct(
      size(sents).cast("long").as("n_sentences"),
      nWords.as("n_words"),
      nSyll.as("n_syllables"),
      when(nWords > 0, grade).as("fk_grade"))
  }

  /** Markdown / code structure signals — the document-structure features
    * code-and-docs corpus filters key on (heading density, fenced code
    * blocks, list share, link share, and a braces/semicolon/indent
    * code-likeness vote). One scan pass of portable regex counts; counts
    * are exact integers and the derived ratio is a single division
    * (engine-bit-identical — the datasheet rule).
    *
    * Returns a struct: n_lines, n_headings, n_code_fences (PAIRS of ```
    * fences, i.e. fence markers / 2), n_list_items, n_links,
    * code_like (int vote 0..3: `{`+`}` present, `;` ends ≥ 3 lines,
    * ≥ 3 indented lines), heading_ratio. */
  def markdownStats(text: Column): Column = {
    def count(re: String): Column =
      size(regexp_extract_all(text, lit(re), lit(0)))
    val nLines = size(split(text, "\n"))
    val headings = count("(?m)^#{1,6} ")
    val fences = count("(?m)^```")
    val listItems = count("(?m)^ {0,3}(?:[-*+]|[0-9]+\\.) ")
    val links = count("\\[[^\\]\\[]*\\]\\([^()]*\\)")
    val semiLines = count("(?m);[ \\t]*$")
    val indented = count("(?m)^(?:    |\\t)[^ \\t\\n]")
    val codeLike = (when(text.contains("{") && text.contains("}"), 1)
      .otherwise(0)
      + when(semiLines >= 3, 1).otherwise(0)
      + when(indented >= 3, 1).otherwise(0)).cast("int")
    struct(
      nLines.as("n_lines"),
      headings.as("n_headings"),
      (fences / 2).cast("int").as("n_code_fences"),
      listItems.as("n_list_items"),
      links.as("n_links"),
      codeLike.as("code_like"),
      (headings.cast("double") / nLines.cast("double")).as("heading_ratio"))
  }

  /** TF-IDF keyword extraction: the top-k most distinctive terms per
    * document against the corpus's document frequencies — the keyword
    * metadata a retrieval/labeling pipeline attaches per doc. Smoothed
    * idf = ln((N+1)/(df+1)) ≥ 0 (arguments strictly positive — the ln(0)
    * portability rule), and the score is [[Curate.roundSig6]]-rounded
    * BEFORE ranking so both engines order identical doubles (the
    * engine-divergent-boolean rule applied to a rank; a 1-ulp ln()
    * difference must not flip neighbors). Ties → lexicographic token.
    *
    * Scale shape: (doc, token) counts and token document frequencies are
    * combinable aggregates; the df join shuffles on the token; the top-k
    * window partitions by doc (frame bounded by the doc's vocabulary). N
    * is one count() collected and inlined as a literal (never a scalar
    * crossJoin — the BroadcastNestedLoopJoin rule). */
  def tfidfKeywords(
      docs: DataFrame, id: Column, text: Column, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.count().toDouble
    val toks = docs
      .select(id.as("doc_id"), explode(split(lower(text), " ")).as("tok"))
      .where(col("tok") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfr, Seq("tok"))
      .withColumn("tfidf", Curate.roundSig6(
        col("tf").cast("double") *
          log(lit(nDocs + 1.0) / (col("df").cast("double") + 1.0))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok").asc)
    scored.withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("tfidf"), col("kw_rank"))
  }
}
