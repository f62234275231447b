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

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): label each
    * document by which side of two cross-entropy CUTOFFS it falls on —
    * `head` (≤ c1, the best band, what they train on), `middle` (≤ c2),
    * `tail` (the rest; docs too short to score land in `tail` too, CCNet
    * likewise discards them). Cutoffs are CALLER-SUPPLIED constants, as in
    * CCNet production, where per-language cutoff files are computed once in
    * a calibration step and applied corpus-wide — see
    * [[perplexityCutoffs]] for that step. The gate compares the
    * 6-sig-fig-rounded cross-entropy (the [[Curate.roundSig6]] rule:
    * cross-row double sums are association-order divergent between engines,
    * and no output rounding can absorb a flipped LABEL), so any engine
    * reproduces the identical buckets.
    *
    * Scale shape: scoring inherits [[crossEntropy]]'s contract (model
    * broadcasts, corpus shuffles only (doc_id, logp) rows into one per-doc
    * aggregate); the bucket label is a scan-stage CASE over the score —
    * applying calibrated cutoffs costs nothing beyond the scoring pass.
    * Returns docs' id + (cross_entropy, n_grams, bucket).
    */
  def perplexityBuckets(
      docs: DataFrame, id: Column, text: Column,
      model: DataFrame, n: Int, cutoffs: (Double, Double),
      alpha: Double = 0.1): DataFrame = {
    require(cutoffs._1 <= cutoffs._2,
      s"cutoffs must be ordered (head <= middle), got $cutoffs")
    val ce = crossEntropy(docs, id, text, model, n, alpha)
    val r = Curate.roundSig6(col("cross_entropy"))
    docs.select(id.as("doc_id"))
      .join(ce, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cross_entropy"), col("n_grams"),
        when(r <= cutoffs._1, lit("head"))
          .when(r <= cutoffs._2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The calibration step producing [[perplexityBuckets]] cutoffs: the
    * q1/q2 DISCRETE quantiles (actual data values, no interpolation — an
    * interpolated midpoint is arithmetic the two engines associate
    * differently) of the 6-sig-fig-rounded cross-entropy. CCNet computes
    * its per-language cutoff file from a sample of the corpus; do the same
    * here — pass `calibration = Sampling.sample(docs, id, f)` at scale.
    * The k-th smallest is taken with `orderBy.limit(k)` = Spark's
    * distributed TakeOrderedAndProject (a per-partition top-k + merge, no
    * global sort), which bounds k to driver memory — exactly why this runs
    * on the calibration sample, not the corpus.
    */
  def perplexityCutoffs(
      calibration: DataFrame, id: Column, text: Column,
      model: DataFrame, n: Int, q1: Double = 1.0 / 3, q2: Double = 2.0 / 3,
      alpha: Double = 0.1): (Double, Double) = {
    require(0 < q1 && q1 <= q2 && q2 < 1, s"need 0 < q1 <= q2 < 1, got ($q1, $q2)")
    val ce = crossEntropy(calibration, id, text, model, n, alpha)
      .select(Curate.roundSig6(col("cross_entropy")).as("ce"))
      .localCheckpoint() // score once, probe twice
    val cnt = ce.count()
    require(cnt > 0, "calibration frame scored no documents")
    def kth(q: Double): Double = {
      val k = math.max(1L, math.ceil(q * cnt).toLong)
      require(k <= Int.MaxValue,
        s"calibration frame too large for a top-$k cutoff — run this on a " +
          s"sample (Sampling.sample), as CCNet's calibration step does")
      ce.orderBy(col("ce").asc).limit(k.toInt)
        .agg(max(col("ce"))).head().getDouble(0)
    }
    (kth(q1), kth(q2))
  }
}
