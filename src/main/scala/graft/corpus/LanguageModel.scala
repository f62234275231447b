package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based character n-gram language model for perplexity filtering —
  * the CCNet quality gate (Wenzek et al. 2020, arXiv:1911.00359): train a
  * small LM on a high-quality corpus (their Wikipedia; here any frame),
  * score every candidate document by cross-entropy, keep the low-perplexity
  * band. KenLM's Kneser–Ney is substituted by add-α smoothing over raw
  * counts (declared divergence: no trained-model artifact can ship here and
  * α-smoothing is engine-portable to the SQL oracle; the pipeline shape —
  * train counts → broadcast → score-join → per-doc aggregate — is the
  * production shape either way).
  *
  * Model definition (all counts over code points):
  *  - c_n(g): occurrences of n-gram g in the training text
  *  - c_ctx(ctx) = Σ_c c_n(ctx·c) — derived from c_n, so the conditional
  *    P(c|ctx) = (c_n + α)/(c_ctx + α·V) is properly normalized
  *  - V: distinct final characters across observed n-grams
  *  - cross-entropy H(doc) = −(1/T) Σ_t log₂ P(c_t|ctx_t), T = len−n+1;
  *    perplexity = 2^H. Docs shorter than n score no grams and drop out.
  *
  * Scale shape: training is one explode + combinable count aggregate
  * (char-level vocab is bounded — |Σ|ⁿ grams at most, megabytes for n=3);
  * scoring broadcasts the model to both joins, so the candidate corpus
  * never shuffles — (doc, gram) rows flow scan → broadcast-hash-join →
  * partial agg. At 100 TB the only wide op is the per-doc sum, keyed by
  * doc_id (no skew: every doc contributes len−n+1 rows).
  */
object LanguageModel {

  /** Positions 1..len−n+1 → the n-gram starting there. Empty for short text. */
  private def ngrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Train: n-gram counts from `corpus.text`. Returns (gram, cnt). */
  def charNgramCounts(corpus: DataFrame, text: Column, n: Int): DataFrame = {
    require(n >= 2, s"need n >= 2 for a conditional model, got $n")
    corpus.select(explode(ngrams(text, n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
  }

  /** Score: cross-entropy (bits/char) + perplexity per document under the
    * model counts, add-α smoothed. `model` is [[charNgramCounts]] output
    * (or any (gram, cnt) frame of the same n).
    *
    * The vocabulary size V is a single scalar of the MODEL, not of the
    * scored corpus — it is collected to the driver and inlined as a
    * literal rather than cross-joined as a 1-row frame (which would plan a
    * BroadcastNestedLoopJoin into every score row's stage). The model frame
    * is localCheckpointed first, so the training plan runs ONCE and the two
    * broadcast dims (+ the V scalar) all read the materialized counts — one
    * training pass total, down from two. localCheckpoint, not persist:
    * checkpoint RDD blocks are reference-tracked and freed by the
    * ContextCleaner once the returned frame is unreachable, so a
    * long-running stream scoring a fresh model per micro-batch
    * ([[Curate.curateBatch]]) does not accumulate cache entries forever.
    */
  def crossEntropy(
      docs: DataFrame, id: Column, text: Column,
      model: DataFrame, n: Int, alpha: Double = 0.1): DataFrame = {
    val m = model.localCheckpoint()
    val v = m.agg(countDistinct(substring(col("gram"), n, 1)))
      .head().getLong(0).toDouble
    val m3 = m.select(col("gram"), col("cnt").as("cg"))
    val mCtx = m.groupBy(substring(col("gram"), 1, n - 1).as("ctx"))
      .agg(sum(col("cnt")).as("cc"))
    val grams = docs.select(id.as("doc_id"), explode(ngrams(text, n)).as("gram"))
    grams
      .join(broadcast(m3), Seq("gram"), "left")
      .join(broadcast(mCtx), substring(col("gram"), 1, n - 1) === col("ctx"), "left")
      .select(col("doc_id"),
        log((coalesce(col("cg"), lit(0L)) + alpha) /
          (coalesce(col("cc"), lit(0L)) + lit(alpha * v))).as("lp"))
      .groupBy("doc_id")
      .agg((-sum(col("lp")) / log(lit(2.0)) / count(lit(1))).as("cross_entropy"),
        count(lit(1)).as("n_grams"))
      .withColumn("perplexity", pow(lit(2.0), col("cross_entropy")))
  }
}
