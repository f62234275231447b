package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span/paragraph-level deduplication: remove REPEATED SPANS across
  * documents, not repeated documents. Web corpora share boilerplate
  * (headers, navigation, license blurbs) between otherwise-distinct pages;
  * whole-document dedup ([[Dedup]]) never touches those, so the standard
  * curation pipeline also runs a span pass that drops any paragraph seen in
  * ≥ `minDocs` distinct documents and reassembles each document from its
  * surviving spans, order preserved.
  *
  * Scale shape (100 TB): the corpus text NEVER shuffles. Candidate
  * detection explodes only (doc_id, span_idx, md5-of-span) postings —
  * id-sized rows — into one map-side-combinable aggregate; the only thing
  * joined back onto the corpus is the per-document list of span INDICES to
  * drop (empty for the overwhelming majority of documents, so the join's
  * build side is the duplicated fringe, not the corpus). Reassembly is a
  * per-row array filter + join — a narrow codegen projection, no shuffle.
  *
  * No reference analog (syslog-ng operates on messages); the operator
  * follows the repo's determinism rules — md5-only hashing, content-derived
  * decisions, no rand().
  */
object SpanDedup {

  /** Fixed-size word windows: span i = words [i·k, (i+1)·k). The last span
    * may be shorter. `array_join(windowSpans(t,k), " ") == t` for
    * single-space-separated text, so reassembly is lossless when nothing is
    * dropped. One codegen projection, no shuffle.
    */
  def windowSpans(text: Column, k: Int): Column = {
    require(k >= 1, s"span window must be >= 1 word, got $k")
    val words = split(text, " ")
    val nSpans = ceil(size(words).cast("double") / k).cast("int")
    transform(sequence(lit(0), greatest(nSpans, lit(1)) - 1),
      i => array_join(slice(words, i * k + 1, lit(k)), " "))
  }

  /** Delimiter paragraphs (e.g. "\n\n" for real prose). Reassembly joins
    * with the same delimiter, so split→join round-trips exactly.
    */
  def paragraphSpans(text: Column, delim: String): Column =
    split(text, java.util.regex.Pattern.quote(delim))

  /** The ONE normalization + hash defining "the same span" (mirrors
    * [[Dedup.contentHash]]'s role): md5 of the lowercased trim. Blank spans
    * hash to NULL so they can never count as boilerplate (and NULL keys
    * drop out of the aggregate for free).
    */
  def spanHash(s: Column): Column =
    when(trim(s) === "" || s.isNull, lit(null)).otherwise(md5(lower(trim(s))))

  /** Cross-document EXACT-SUBSTRING dedup (the ExactSubstr method of Lee
    * et al. 2021, arXiv:2107.06499, word-window granularity): every
    * `windowWords`-word SLIDING window is hashed; a window text occurring ≥
    * `minCount` times in the whole corpus (within-doc repeats count, per the
    * paper) keeps only its globally-FIRST occurrence — minimum (doc, pos) —
    * and every other occurrence's word positions are removed from their
    * documents, which are then reassembled in order. Differs from
    * [[dedupSpans]] in all three choices that make it the paper's operator:
    * sliding (not aligned) windows, total-occurrence (not distinct-doc)
    * counting, and keep-first (not remove-everywhere) semantics.
    *
    * Scale shape: identical to [[dedupSpans]] — only (doc, pos, md5)
    * postings shuffle (one row per word, the same posting volume as a
    * shingle join), the keeper is a combinable min(struct(doc, pos))
    * aggregate, and only documents that actually LOSE words appear on the
    * build side of the reassembly join. A viral window (boilerplate in 10⁸
    * docs) is one hash group whose occurrence rows join against a
    * single-row build side — no window/collect of the group is ever
    * materialized.
    *
    * @return input columns + `text_clean` (surviving words joined with a
    *         single space), `n_words`, `n_removed`
    */
  def exactSubstrDedup(
      docs: DataFrame, id: Column, text: Column,
      windowWords: Int, minCount: Int = 2): DataFrame = {
    require(windowWords >= 1, s"window must be >= 1 word, got $windowWords")
    require(minCount >= 2, s"minCount < 2 would remove unique text (got $minCount)")
    val base = docs.withColumn("__doc_id", id).withColumn("__words", split(text, " "))
    val nw = size(col("__words"))
    // postings: (doc, 0-based window start, md5 of the window text); docs
    // shorter than the window emit none
    val posts = base.select(col("__doc_id").as("doc_id"),
      posexplode(
        when(nw >= windowWords,
          transform(sequence(lit(0), nw - windowWords),
            i => md5(array_join(slice(col("__words"), i + 1, lit(windowWords)), " "))))
          .otherwise(array().cast("array<string>"))).as(Seq("pos", "wh")))
    val dup = posts.groupBy(col("wh"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("keeper"))
      .filter(col("n_occ") >= minCount)
    // every non-keeper occurrence surrenders its word positions
    val removed = posts.join(dup, Seq("wh"))
      .filter(!(col("doc_id") === col("keeper.doc_id") &&
        col("pos") === col("keeper.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + windowWords - 1)).as("p"))
    val dropIdx = removed.groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("__drop"))
      .withColumnRenamed("doc_id", "__drop_doc")
    base.join(dropIdx, col("__doc_id") === col("__drop_doc"), "left")
      .withColumns(Map(
        "text_clean" -> array_join(
          filter(col("__words"),
            (w, i) => !coalesce(array_contains(col("__drop"), i), lit(false))),
          " "),
        "n_words" -> size(col("__words")).cast("long"),
        "n_removed" -> coalesce(size(col("__drop")), lit(0)).cast("long")))
      .drop("__doc_id", "__words", "__drop", "__drop_doc")
  }

  /** NEAR-duplicate span removal — the fuzzy sibling of [[dedupSpans]]:
    * boilerplate that varies slightly between pages (cookie banners with
    * different dates/versions, templated footers) never hashes equal, so
    * the exact pass misses it. Here each non-blank span is a MinHash-LSH
    * unit ([[Dedup.minhashLsh]] at word-shingle Jaccard ≥ `threshold`),
    * clusters resolve by connected components ([[Dedup.resolveClusters]]),
    * and each multi-span cluster keeps ONLY its globally-first member —
    * minimum (doc_id, span_idx), encoded as a zero-padded sortable key so
    * the min-label CC pass needs no struct ordering. Two near-identical
    * paragraphs INSIDE one document also collapse (the later drops) —
    * within-page boilerplate is boilerplate too.
    *
    * Scale shape: inherits the LSH contract — only (key, band-bucket) and
    * shingle-hash postings shuffle, span text stays put; the reassembly
    * join's build side is the duplicated fringe. `id` must be numeric
    * (the zero-padded key needs a total order).
    *
    * @return input columns + `text_clean`, `n_spans`, `n_dropped` (same
    *         contract as [[dedupSpans]])
    */
  def nearDedupSpans(
      docs: DataFrame, id: Column, spans: Column,
      delim: String = " ", shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val base = docs.withColumn("__doc_id", id).withColumn("__spans", spans)
    val units = base
      .select(col("__doc_id").as("doc_id"),
        posexplode(col("__spans")).as(Seq("span_idx", "s")))
      .filter(trim(col("s")) =!= "")
      .withColumn("span_key",
        format_string("%019d:%09d", col("doc_id"), col("span_idx")))
    // viral-duplicate-safe edges ([[Dedup.corpusEdges]]): EXACT-identical
    // spans collapse to one representative before the LSH — boilerplate,
    // the very thing this operator targets, makes thousands of identical
    // spans share one signature, and banding identical signatures is a
    // quadratic candidate-pair explosion; the content star edges carry the
    // members losslessly (identical spans have Jaccard 1)
    val clusters = Dedup.resolveClusters(
      units.select(col("span_key").as("member_id")),
      Dedup.corpusEdges(units, col("span_key"), col("s"), shingleK, threshold),
      "doc_a", "doc_b")
    val drops = units.join(
        clusters.filter(col("member_id") =!= col("keep_id"))
          .select(col("member_id")),
        units("span_key") === col("member_id"))
      .select(col("doc_id"), col("span_idx"))
    val dropIdx = drops.groupBy(col("doc_id"))
      .agg(collect_set(col("span_idx")).as("__drop"))
      .withColumnRenamed("doc_id", "__drop_doc")
    base
      .join(dropIdx, col("__doc_id") === col("__drop_doc"), "left")
      .withColumns(Map(
        "text_clean" -> array_join(
          filter(col("__spans"),
            (s, i) => !coalesce(array_contains(col("__drop"), i), lit(false))),
          delim),
        "n_spans" -> size(col("__spans")).cast("long"),
        "n_dropped" -> coalesce(size(col("__drop")), lit(0)).cast("long")))
      .drop("__doc_id", "__spans", "__drop", "__drop_doc")
  }

  /** Remove spans duplicated across ≥ `minDocs` distinct documents.
    *
    * @param docs      corpus frame
    * @param id        document id column (globally unique)
    * @param spans     span array for the document — [[windowSpans]] or
    *                  [[paragraphSpans]] of the text column
    * @param delim     the string reassembly joins spans with (must match
    *                  how `spans` was produced for lossless round-trip)
    * @param minDocs   a span is "duplicated" when it appears in at least
    *                  this many DISTINCT documents (2 = any cross-doc
    *                  repeat; raise for a frequency-based boilerplate bar)
    * @param keepFirst false (default) removes a duplicated span from EVERY
    *                  document — true boilerplate removal; true keeps the
    *                  copies in the minimum-id document and strips the rest
    *                  — span-level "keep one survivor" dedup
    * @return input columns + `text_clean` (reassembled surviving spans,
    *         "" when everything was boilerplate), `n_spans`, `n_dropped`
    */
  def dedupSpans(
      docs: DataFrame, id: Column, spans: Column,
      delim: String = " ", minDocs: Int = 2,
      keepFirst: Boolean = false): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would drop spans unique to one doc (got $minDocs)")
    val base = docs.withColumn("__doc_id", id).withColumn("__spans", spans)
    // postings: (doc_id, span_idx, span-hash) — the ONLY exploded/shuffled
    // rows; span text stays in the source rows
    val postings = base
      .select(col("__doc_id").as("doc_id"),
        posexplode(transform(col("__spans"), s => spanHash(s))).as(Seq("span_idx", "sh")))
      .filter(col("sh").isNotNull)
    val dup = postings
      .groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
    val dropRows0 = postings.join(dup, Seq("sh"))
    val dropRows =
      if (keepFirst) dropRows0.filter(col("doc_id") =!= col("first_doc"))
      else dropRows0
    // per-doc drop-index list: rows exist ONLY for documents that lose a
    // span — the join's build side is the duplicated fringe, not the corpus
    val dropIdx = dropRows.groupBy(col("doc_id"))
      .agg(collect_set(col("span_idx")).as("__drop"))
      .withColumnRenamed("doc_id", "__drop_doc")
    base
      .join(dropIdx, col("__doc_id") === col("__drop_doc"), "left")
      .withColumns(Map(
        "text_clean" -> array_join(
          filter(col("__spans"),
            (s, i) => !coalesce(array_contains(col("__drop"), i), lit(false))),
          delim),
        "n_spans" -> size(col("__spans")).cast("long"),
        "n_dropped" -> coalesce(size(col("__drop")), lit(0)).cast("long")))
      .drop("__doc_id", "__spans", "__drop", "__drop_doc")
  }
}
