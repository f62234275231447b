package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the training-data analog of
  * [[graft.Pipeline]]'s parse→enrich→route→aggregate: URL dedup → text
  * near-dup dedup (among URL survivors, as production runs it) → quality
  * gates → perplexity gate → PII redaction → leakage-safe split, emitted in
  * AUDIT shape: one row per INPUT document with every stage's flag, so
  * per-stage attrition is one groupBy away and `kept` is the conjunction.
  *
  * Stage semantics:
  *  - `url_keeper`: minimum doc per canonical URL ([[Url.urlDedup]]).
  *  - `dedup_keeper`: minimum-id survivor of the MinHash-LSH + CC
  *    clustering run over URL KEEPERS ONLY — dedup after URL collapse, the
  *    production order (a URL-dropped copy must not steal keeper-ship from
  *    a cluster it no longer represents); URL-dropped docs are false.
  *  - `quality_pass`: the composite Gopher gate ([[TextStats.gopherQuality]]).
  *  - `cross_entropy`: CCNet-shaped char-trigram score under a model
  *    trained on the corpus's target-language slice; gate at `ceCap`.
  *  - `redacted_md5`: md5 of the PII-redacted text ([[Pii.redact]]) — the
  *    text that would ship.
  *  - `split`: leakage-safe label keyed on the near-dup cluster id
  *    (URL-dropped docs key on themselves; they are never kept).
  *  - `kept` = url_keeper ∧ dedup_keeper ∧ quality_pass ∧ (ce ≤ cap).
  *
  * Scale shape: every stage keeps its own contract (posting-only dedup
  * shuffles, broadcast LM joins, scan-stage gates); the composition adds
  * only id-keyed joins of doc-level flag frames.
  */
object Curate {

  def curate(
      docs: DataFrame, id: Column, text: Column, url: Column, lang: Column,
      targetLang: String = "en", ceCap: Double = 1.13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("__text"), url.as("__url"),
      lang.as("__lang"))
    val urlFlags = Url.urlDedup(base, col("doc_id"), col("__url"))
      .select(col("doc_id"), col("is_keeper").as("url_keeper"), col("__text"))
    val keepers = urlFlags.filter(col("url_keeper"))
    val clusters = Dedup.resolveClusters(
      keepers.select(col("doc_id").as("member_id")),
      Dedup.minhashLsh(keepers, col("doc_id"), col("__text")),
      "doc_a", "doc_b")
    val model = LanguageModel.charNgramCounts(
      base.filter(col("__lang") === targetLang), col("__text"), n = 3)
    val ce = LanguageModel.crossEntropy(
      base, col("doc_id"), col("__text"), model, n = 3)
      .select(col("doc_id"), col("cross_entropy"))
    base
      .join(urlFlags.select(col("doc_id"), col("url_keeper")), Seq("doc_id"))
      .join(clusters.select(col("member_id").as("doc_id"), col("cluster_id"),
        (col("member_id") === col("keep_id")).as("__dk")), Seq("doc_id"), "left")
      .join(ce, Seq("doc_id"), "left")
      // explode(array(..)) is the repo's Generate barrier: without it
      // CollapseProject inlines the quality struct into each consumer and
      // the one-pass expression runs twice per row
      .select(col("doc_id"), col("url_keeper"), col("__dk"), col("cluster_id"),
        col("cross_entropy"), col("__text"),
        explode(array(TextStats.gopherQuality(col("__text")).getField("pass")))
          .as("__qp"))
      .select(col("doc_id"),
        col("url_keeper"),
        coalesce(col("__dk"), lit(false)).as("dedup_keeper"),
        col("__qp").as("quality_pass"),
        col("cross_entropy"),
        md5(Pii.redact(col("__text"))).as("redacted_md5"),
        Sampling.splitLabel(coalesce(col("cluster_id"), col("doc_id")), splits).as("split"),
        (col("url_keeper") && coalesce(col("__dk"), lit(false)) && col("__qp") &&
          coalesce(col("cross_entropy") <= ceCap, lit(false))).as("kept"))
  }

  /** [[curate]] with per-stage attrition counters attached via `observe`
    * (no extra scans): on the next action over the returned frame, the
    * session's [[graft.observe.Stats]] collector records
    * corpus_in / url_dropped / dedup_dropped / quality_dropped /
    * perplexity_dropped / kept under the given stage — the corpus face of
    * the north rule's "metrics emitted to a stats table" (the log pipeline
    * wires the same collector through its sink writes).
    *
    * Drop counters are attributed CUMULATIVELY in pipeline order: a doc
    * counts against the FIRST stage that rejected it, so the counters sum:
    * in = url + dedup + quality + perplexity + kept.
    */
  def curateObserved(
      docs: DataFrame, id: Column, text: Column, url: Column, lang: Column,
      stage: String = "curate",
      targetLang: String = "en", ceCap: Double = 1.13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)): DataFrame = {
    val audited = curate(docs, id, text, url, lang, targetLang, ceCap, splits)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    graft.observe.Stats.observed(audited, stage,
      "url_dropped" -> cnt(!col("url_keeper")),
      "dedup_dropped" -> cnt(col("url_keeper") && !col("dedup_keeper")),
      "quality_dropped" -> cnt(col("url_keeper") && col("dedup_keeper") &&
        !col("quality_pass")),
      "perplexity_dropped" -> cnt(col("url_keeper") && col("dedup_keeper") &&
        col("quality_pass") && !coalesce(col("cross_entropy") <= ceCap, lit(false))),
      "kept" -> cnt(col("kept")))
  }
}
