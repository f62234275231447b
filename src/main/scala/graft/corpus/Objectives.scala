package graft.corpus

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pretraining-objective sample preparation — the deterministic text
  * transforms that sit between a curated corpus and the token stream:
  *
  *  - [[fim]]: fill-in-the-middle reordering (Bavarian et al. 2022,
  *    arXiv:2207.14255): split a document at two content-derived cut
  *    points and emit the PSM layout
  *    `<fim_prefix>P<fim_suffix>S<fim_middle>M`, applied to an
  *    md5-gated fraction of documents (the paper's ~50% FIM rate) — the
  *    transform that teaches code models infilling.
  *  - [[spanCorrupt]]: T5 span corruption (Raffel et al. 2020,
  *    arXiv:1910.10683 §3.1.4): mask word blocks with sequential
  *    sentinels, inputs keep `<extra_id_k>` where block k was removed,
  *    targets list `<extra_id_k> masked words…` in order.
  *
  * Both are SCAN-STAGE column expressions: no shuffle, no UDF, no state.
  * All randomness is the repo's md5 convention (content/id-derived,
  * reproducible across retries and engines). Span starts are ALIGNED
  * `blockWords`-word blocks — T5's random-length spans replaced by the
  * deterministic equivalent (mean span = blockWords), the same
  * realization choice [[SpanDedup.windowSpans]] makes; the corruption
  * RATE still matches the requested fraction in expectation.
  */
object Objectives {

  /** Gate: md5-prefix draw under `rate` keyed by `tag:id`. */
  private def gate(tag: String, id: Column, rate: Double): Column =
    substring(md5(concat(lit(tag + ":"), id.cast("string"))), 1, 8) <
      Sampling.thresholdHex(rate)

  private def hashMod(tag: String, id: Column, m: Column): Column =
    pmod(conv(substring(md5(concat(lit(tag + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long"), m.cast("long"))

  /** Fill-in-the-middle: character cut points a ≤ b drawn md5-uniform in
    * [0, len]; gated documents emit
    * `<fim_prefix>text[0,a)<fim_suffix>text[b,len)<fim_middle>text[a,b)`
    * (the PSM layout — the middle moves to the end so a causal LM learns
    * to infill), everything else passes through unchanged. Documents
    * shorter than 2 chars never transform.
    */
  def fim(text: Column, id: Column, rate: Double = 0.5): Column = {
    val n = length(text)
    val a = hashMod("fima", id, n + 1)
    val b = hashMod("fimb", id, n + 1)
    val lo = least(a, b).cast("int")
    val hi = greatest(a, b).cast("int")
    when(gate("fim", id, rate) && n >= 2,
      concat(lit("<fim_prefix>"), text.substr(lit(1), lo),
        lit("<fim_suffix>"), text.substr(hi + 1, n - hi),
        lit("<fim_middle>"), text.substr(lo + 1, hi - lo)))
      .otherwise(text)
  }

  /** T5 span corruption over aligned `blockWords`-word blocks: block j of
    * a document masks iff its md5 draw (keyed `span:id:j`) falls under
    * `maskRate`. Returns a struct:
    *  - `input`: surviving words with each masked block replaced by its
    *    sentinel `<extra_id_k>` (k = number of masked blocks before it —
    *    sequential, per document)
    *  - `target`: `<extra_id_k> …masked words…` for every masked block in
    *    order, ending with the final sentinel (the T5 layout)
    *  - `n_masked`: masked block count
    * One pass via an `aggregate` fold over the block indices — O(blocks)
    * per document, scan-stage.
    */
  def spanCorrupt(
      text: Column, id: Column,
      blockWords: Int = 3, maskRate: Double = 0.15): Column = {
    require(blockWords >= 1, s"blockWords must be >= 1, got $blockWords")
    val words = split(text, " ")
    val nBlocks = ceil(size(words).cast("double") / blockWords).cast("int")
    val blockText = (j: Column) =>
      array_join(slice(words, j * blockWords + 1, lit(blockWords)), " ")
    val masked = (j: Column) =>
      substring(md5(concat(lit("span:"), id.cast("string"), lit(":"), j.cast("string"))),
        1, 8) < Sampling.thresholdHex(maskRate)
    val z = struct(lit("").as("inp"), lit("").as("tgt"), lit(0).as("k"))
    val folded = aggregate(
      sequence(lit(0), greatest(nBlocks, lit(1)) - 1), z,
      (acc, j) => {
        val sent = concat(lit("<extra_id_"), acc.getField("k").cast("string"), lit(">"))
        val sep = when(j === 0, lit("")).otherwise(lit(" "))
        when(masked(j),
          struct(
            concat(acc.getField("inp"), sep, sent).as("inp"),
            concat(acc.getField("tgt"), when(acc.getField("k") === 0, lit(""))
              .otherwise(lit(" ")), sent, lit(" "), blockText(j)).as("tgt"),
            (acc.getField("k") + 1).as("k")))
          .otherwise(
            struct(
              concat(acc.getField("inp"), sep, blockText(j)).as("inp"),
              acc.getField("tgt").as("tgt"),
              acc.getField("k").as("k")))
      })
    struct(
      folded.getField("inp").as("input"),
      // closing sentinel terminates the last span (T5 appends <extra_id_K>)
      when(folded.getField("k") > 0,
        concat(folded.getField("tgt"), lit(" <extra_id_"),
          folded.getField("k").cast("string"), lit(">")))
        .otherwise(folded.getField("tgt")).as("target"),
      folded.getField("k").cast("long").as("n_masked"))
  }
}
