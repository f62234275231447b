package graft.corpus

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → main-text extraction for raw crawl `response` records — the step
  * that turns a WARC fetch into a training-data document (every real
  * Common Crawl pipeline extracts text itself rather than trusting WET:
  * C4, Raffel et al. 2020 §2.2; boilerplate classification follows the
  * jusText shape, Pomikálek 2011: per-block length / link-density /
  * stopword-density).
  *
  * The whole extractor is a pure column expression — regex/string stages a
  * scan evaluates per row, no UDF, no shuffle — and every stage is
  * engine-portable (capture-free RE2-compatible regexes, the repo's oracle
  * rule), so the DuckDB oracle recomputes the extraction relationally:
  *
  *  1. strip comments, `<script>`, `<style>` WITH their content;
  *  2. mark anchor spans with sentinels (U+0001 open, U+0002 close) so
  *     link density survives tag stripping;
  *  3. block-level tags → block separator (U+0003); all remaining tags →
  *     space;
  *  4. decode the common named entities (`&amp;` last, so `&amp;lt;`
  *     stays `&lt;` — the standard order); numeric references beyond
  *     `&#39;` are left literal (declared subset: identical in both
  *     engines, and rare in body text);
  *  5. per block: whitespace-collapse, link chars = sentinel-span
  *     lengths, words/stopwords over the sentinel-free text;
  *  6. a block is GOOD iff chars ≥ minChars ∧ link_chars ≤
  *     maxLinkDensity·chars ∧ stops ≥ minStopDensity·words (comparisons
  *     multiplied out — no float division, so both engines compare the
  *     identical doubles);
  *  7. document text = good blocks joined with '\n'.
  *
  * Scale shape: runs inside the scan projection over each record — the
  * 100 TB cost is exactly the regex passes, embarrassingly parallel per
  * file; the extracted text feeds the existing C4/Gopher/curation gates
  * unchanged.
  */
object HtmlText {

  /** Anchor-open / anchor-close / block-separator sentinels — control
    * chars that cannot appear in sane HTML text. */
  val AnchorOpen = "\u0001"
  val AnchorClose = "\u0002"
  val BlockSep = "\u0003"

  /** Block-level elements whose open OR close tag ends a text block. */
  val BlockTagRe: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|br|hr|section|article|aside|header|footer|nav|main|blockquote|pre|form|fieldset)\\b[^>]*>"

  /** Named entities decoded (in this order; `&amp;` must be last). */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /** Stages 1–4: markup stripped, anchors sentinel-marked, blocks
    * separated by [[BlockSep]], entities decoded. */
  def cleaned(html: Column): Column = {
    val c1 = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val c2 = regexp_replace(c1, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val c3 = regexp_replace(c2, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val c4 = regexp_replace(c3, "(?i)<a\\b[^>]*>", AnchorOpen)
    val c5 = regexp_replace(c4, "(?i)</a\\s*>", AnchorClose)
    val c6 = regexp_replace(c5, BlockTagRe, BlockSep)
    val c7 = regexp_replace(c6, "(?s)<[^>]*>", " ")
    Entities.foldLeft(c7) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
  }

  /** Stage 5: per-block stats —
    * array<struct<text, chars, link_chars, n_words, n_stops>> with empty
    * blocks removed. `text` is the whitespace-collapsed, sentinel-free
    * block text. */
  def blockStats(
      html: Column,
      stopwords: Seq[String] = TextStats.EnglishStopwords): Column = {
    val spanRe = AnchorOpen + "[^" + AnchorOpen + AnchorClose + "]*" + AnchorClose
    val all = transform(split(cleaned(html), BlockSep), b => {
      val norm = trim(regexp_replace(b, "\\s+", " "))
      val linkChars = coalesce(
        aggregate(
          transform(regexp_extract_all(norm, lit(spanRe), lit(0)), m => length(m) - 2),
          lit(0), (acc, x) => acc + x),
        lit(0))
      val visible =
        trim(regexp_replace(translate(norm, AnchorOpen + AnchorClose, ""), " +", " "))
      val words = filter(split(lower(visible), " "), w => w =!= "")
      struct(
        visible.as("text"),
        length(visible).as("chars"),
        linkChars.as("link_chars"),
        size(words).as("n_words"),
        size(filter(words, w => w.isin(stopwords: _*))).as("n_stops"))
    })
    filter(all, b => b.getField("chars") > 0)
  }

  /** Stages 6–7: struct<text, n_blocks, n_good> — the extracted main text
    * plus block attrition counters. */
  def extract(
      html: Column, minChars: Int = 25, maxLinkDensity: Double = 0.35,
      minStopDensity: Double = 0.05,
      stopwords: Seq[String] = TextStats.EnglishStopwords): Column = {
    val bs = blockStats(html, stopwords)
    val good = filter(bs, b =>
      b.getField("chars") >= minChars &&
        b.getField("link_chars").cast("double") <=
          lit(maxLinkDensity) * b.getField("chars").cast("double") &&
        b.getField("n_stops").cast("double") >=
          lit(minStopDensity) * b.getField("n_words").cast("double"))
    struct(
      array_join(transform(good, _.getField("text")), "\n").as("text"),
      size(bs).as("n_blocks"),
      size(good).as("n_good"))
  }

  // ---- compliance signals ------------------------------------------------
  // The opt-out / licensing checks a responsible crawl-to-corpus pipeline
  // runs per page (robots meta directives incl. the `noai` convention;
  // Creative-Commons license links, the signal license-filtered corpora
  // key on). All scan-stage column expressions with portable group-1
  // extraction; double-quoted attributes only (the same declared fixture
  // subset as [[graft.corpus.WebGraph.HrefRe]]).

  /** Lowercased content of the page's `<meta name="robots" …>` tag —
    * attribute order free (name-then-content or content-then-name),
    * empty string when absent. */
  def robotsDirectives(html: Column): Column = {
    val nameFirst = regexp_extract(html,
      "(?is)<meta\\b[^>]*name\\s*=\\s*\"robots\"[^>]*content\\s*=\\s*\"([^\"]*)\"", 1)
    val contentFirst = regexp_extract(html,
      "(?is)<meta\\b[^>]*content\\s*=\\s*\"([^\"]*)\"[^>]*name\\s*=\\s*\"robots\"", 1)
    lower(when(nameFirst =!= "", nameFirst).otherwise(contentFirst))
  }

  /** True iff the robots directives opt the page out of indexing or of
    * AI/training use (`noindex`, `noai`, `noimageai`, `notrain` — the
    * directive set the opt-out conventions use). Comma/space tolerant. */
  def optedOut(html: Column): Column = {
    val dirs = transform(split(robotsDirectives(html), ","), d => trim(d))
    exists(dirs, d => d.isin("noindex", "noai", "noimageai", "notrain"))
  }

  /** Creative-Commons license of the page as `by-sa-4.0`-style ids: the
    * first `creativecommons.org/licenses/<type>/<version>` link found, or
    * empty string. */
  def ccLicense(html: Column): Column = {
    val t = regexp_extract(html,
      "(?i)creativecommons\\.org/licenses/([a-z-]+)/([0-9.]+)", 1)
    val v = regexp_extract(html,
      "(?i)creativecommons\\.org/licenses/([a-z-]+)/([0-9.]+)", 2)
    when(t === "", lit("")).otherwise(concat(lower(t), lit("-"), v))
  }
}
