package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select source documents that look like a TARGET
  * distribution by (1) featurizing every document as a bag of hashed word
  * uni+bigrams over `buckets` buckets, (2) fitting bucketed categorical
  * distributions to target and source, (3) scoring each source document
  * with the log importance weight log w(x) = Σ_b f_x[b]·(ln p̂_tgt[b] −
  * ln p̂_src[b]), and (4) Gumbel-top-k resampling on log w(x) + g_x.
  *
  * Determinism: the paper's Gumbel noise is derived here from md5(doc id)
  * (u = (v+0.5)/2^52 with v the first 13 md5 hex digits → g = −ln(−ln u)) —
  * the repo-wide no-rand() rule; the +0.5 keeps u strictly inside (0,1) so
  * neither engine ever evaluates ln(0) (whose result differs across
  * engines: NULL in Spark, −inf in DuckDB).
  *
  * Scale shape: fitting is explode → one combinable count aggregate per
  * corpus (the model is `buckets`-sized, megabytes). Scoring explodes
  * (doc, bucket) rows and broadcast-joins the two count tables — the
  * corpus never shuffles; the per-doc sum is the only wide op. Top-k is a
  * global sort of doc-level rows LIMIT k (k ≪ n; for huge k switch to a
  * threshold on the key, same semantics).
  */
object Dsir {

  /** Hashed feature-bucket stream: one element per word-unigram and
    * word-bigram occurrence, bucket = first-8-md5-hex-digits mod B.
    * (conv() hex→decimal mirrors DuckDB's ('0x'||hex)::BIGINT.) */
  def hashedBuckets(text: Column, buckets: Int): Column = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val w = split(text, " ")
    val bi = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    transform(concat(w, bi),
      g => pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(buckets)))
  }

  /** Fit: (bucket, cnt) counts of the hashed feature stream over a corpus. */
  def fitBuckets(corpus: DataFrame, text: Column, buckets: Int): DataFrame =
    corpus.select(explode(hashedBuckets(text, buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document log importance weight under add-α smoothed bucket models.
    * `target`/`source` are [[fitBuckets]] outputs. Returns (doc_id,
    * log_weight, n_feats). Docs with no features drop out (no words → no
    * evidence either way).
    */
  def logWeights(
      docs: DataFrame, id: Column, text: Column,
      target: DataFrame, source: DataFrame,
      buckets: Int, alpha: Double = 0.1): DataFrame = {
    // The two corpus totals are scalars of the (≤ buckets)-row count
    // tables — materialize those tables, collect the totals as literals,
    // and let the broadcast dims read the blocks. One fitting pass per
    // corpus (down from two), no 1-row BroadcastNestedLoopJoin in the
    // plan, and (localCheckpoint, not persist) the blocks are
    // ContextCleaner-freed when the frame is dropped — no unbounded cache
    // growth under repeated scoring.
    val tp = target.localCheckpoint()
    val sp = source.localCheckpoint()
    val tt = tp.agg(coalesce(sum(col("cnt")), lit(0L)).cast("double")).head().getDouble(0)
    val ts = sp.agg(coalesce(sum(col("cnt")), lit(0L)).cast("double")).head().getDouble(0)
    val t = tp.select(col("bucket"), col("cnt").as("tc"))
    val s = sp.select(col("bucket"), col("cnt").as("sc"))
    docs.select(id.as("doc_id"), explode(hashedBuckets(text, buckets)).as("bucket"))
      .join(broadcast(t), Seq("bucket"), "left")
      .join(broadcast(s), Seq("bucket"), "left")
      .select(col("doc_id"),
        (log((coalesce(col("tc"), lit(0L)) + alpha) / lit(tt + alpha * buckets)) -
          log((coalesce(col("sc"), lit(0L)) + alpha) / lit(ts + alpha * buckets))).as("lr"))
      .groupBy("doc_id")
      .agg(sum(col("lr")).as("log_weight"), count(lit(1)).as("n_feats"))
  }

  /** Deterministic Gumbel key for importance resampling: g = −ln(−ln u),
    * u derived from md5 of the id — strictly inside (0,1). */
  def gumbelKey(id: Column): Column = {
    val v = conv(substring(md5(concat(lit("gum:"), id.cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double")
    -log(-log((v + 0.5) / math.pow(2.0, 52)))
  }

  /** DSIR end-to-end: fit both distributions, score, and mark the Gumbel
    * top-`k` (by log_weight + gumbel, ties to the smaller doc id). Returns
    * every scored doc with its `selected` flag — filter on it for the
    * resampled corpus.
    *
    * Selection is NOT a global rank() window (one task would sort every
    * doc-level row): the k-th boundary comes from a distributed
    * TakeOrderedAndProject (per-partition top-k, merged on the driver —
    * k rows, not n) and broadcasts back as a struct threshold.
    */
  def select(
      docs: DataFrame, id: Column, text: Column,
      targetDocs: DataFrame, targetText: Column,
      k: Int, buckets: Int = 4096, alpha: Double = 0.1): DataFrame = {
    val target = fitBuckets(targetDocs, targetText, buckets)
    val source = fitBuckets(docs, text, buckets)
    val scored = logWeights(docs, id, text, target, source, buckets, alpha)
      .withColumn("gumbel", gumbelKey(col("doc_id")))
      .withColumn("__nk", -(col("log_weight") + col("gumbel")))
    // The k-th boundary is ONE struct — collect it (TakeOrderedAndProject
    // merges k per-partition rows on the driver; the head() sees one) and
    // compare against a literal, rather than cross-joining a 1-row frame
    // (a BroadcastNestedLoopJoin in every scored row's stage otherwise).
    val b = scored
      .orderBy(col("__nk").asc, col("doc_id").asc).limit(k)
      .agg(max(struct(col("__nk"), col("doc_id"))).as("b"))
      .head().getStruct(0)
    val selected =
      if (b == null) lit(false)
      else coalesce(struct(col("__nk"), col("doc_id")) <=
        struct(lit(b.get(0)).as("__nk"), lit(b.get(1)).as("doc_id")),
        lit(false))
    scored.withColumn("selected", selected).drop("__nk")
  }
}
