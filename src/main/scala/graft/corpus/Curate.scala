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

  /** Round a positive double column to 6 significant figures — the parity
    * contract's resolution. cross_entropy is a cross-row double sum whose
    * association order legitimately differs between engines (a few ulps);
    * gating the RAW value at `ceCap` would let a ulp at the boundary flip
    * the `kept` boolean, which no output rounding can absorb. Both the
    * Spark gate and the oracle apply this identical double-arithmetic
    * formula first, so they compare the same 6-sig-fig double. */
  private[corpus] def roundSig6(x: Column): Column = {
    val p = pow(lit(10.0), floor(log10(abs(x))) - 5)
    when(x.isNull || x === 0.0, x).otherwise(round(x / p) * p)
  }

  /** The gated cross-entropy comparison — shared by [[curate]]'s `kept`
    * and [[curateObserved]]'s attrition counters so they always agree. */
  private def cePass(ce: Column, ceCap: Double): Column =
    coalesce(roundSig6(ce) <= ceCap, lit(false))

  /** The shared audit projection over a frame carrying doc_id, url_keeper,
    * __dk, cluster_id, cross_entropy, __text. */
  private def auditSelect(
      joined: DataFrame, ceCap: Double, splits: Seq[(String, Double)]): DataFrame =
    joined
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
          cePass(col("cross_entropy"), ceCap)).as("kept"))

  /** @param lm optional FROZEN char-trigram counts ((gram, cnt), n = 3) to
    *           score cross-entropy under; None (the default) trains on the
    *           corpus's own `targetLang` slice. */
  def curate(
      docs: DataFrame, id: Column, text: Column, url: Column, lang: Column,
      targetLang: String = "en", ceCap: Double = 1.13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
      lm: Option[DataFrame] = None): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("__text"), url.as("__url"),
      lang.as("__lang"))
    val urlFlags = Url.urlDedup(base, col("doc_id"), col("__url"))
      .select(col("doc_id"), col("is_keeper").as("url_keeper"), col("__text"))
    val keepers = urlFlags.filter(col("url_keeper"))
    // corpusEdges, not raw minhashLsh: URL-distinct pages with IDENTICAL
    // text are common (mirrors), and banding a viral exact-dup group is
    // quadratic; the collapsed edge set clusters identically
    val clusters = Dedup.resolveClusters(
      keepers.select(col("doc_id").as("member_id")),
      Dedup.corpusEdges(keepers, col("doc_id"), col("__text")),
      "doc_a", "doc_b")
    val model = lm.getOrElse(LanguageModel.charNgramCounts(
      base.filter(col("__lang") === targetLang), col("__text"), n = 3))
    val ce = LanguageModel.crossEntropy(
      base, col("doc_id"), col("__text"), model, n = 3)
      .select(col("doc_id"), col("cross_entropy"))
    auditSelect(
      base
        .join(urlFlags.select(col("doc_id"), col("url_keeper")), Seq("doc_id"))
        .join(clusters.select(col("member_id").as("doc_id"), col("cluster_id"),
          (col("member_id") === col("keep_id")).as("__dk")), Seq("doc_id"), "left")
        .join(ce, Seq("doc_id"), "left"),
      ceCap, splits)
  }

  /** Persisted curation state — the incremental counterpart's memory:
    * the near-dup [[Dedup.DedupIndex]] built over URL KEEPERS, the
    * (canonical_url, keep_id) URL-keeper table, the FROZEN char-trigram
    * LM counts, and `meta` — one row (max_doc_id) over the WHOLE indexed
    * corpus (not just URL keepers: URL keepership is min-id too, so the
    * monotone-id contract guards every shard doc). Same staged-swap save
    * discipline as the dedup index (the loaded tables are lazy plans over
    * the load dir — never overwrite what you are still reading). */
  final case class CurateIndex(
      dedup: Dedup.DedupIndex, urlKeepers: DataFrame, lm: DataFrame,
      meta: DataFrame) {
    def save(dir: String): Unit = {
      dedup.save(s"$dir/dedup")
      val spark = urlKeepers.sparkSession
      val hconf = spark.sparkContext.hadoopConfiguration
      val staged = Seq("url_keepers" -> urlKeepers, "lm" -> lm,
        "meta" -> meta).map { case (n, df) =>
        val tmp = s"$dir/_staging_$n"
        df.write.mode("overwrite").parquet(tmp)
        n -> tmp
      }
      staged.foreach { case (n, tmp) =>
        val dst = new org.apache.hadoop.fs.Path(s"$dir/$n")
        val src = new org.apache.hadoop.fs.Path(tmp)
        val fs = dst.getFileSystem(hconf)
        if (fs.exists(dst)) fs.delete(dst, true)
        require(fs.rename(src, dst), s"rename $tmp -> $dst failed")
      }
    }
  }

  object CurateIndex {
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): CurateIndex =
      CurateIndex(
        Dedup.DedupIndex.load(spark, s"$dir/dedup"),
        spark.read.parquet(s"$dir/url_keepers"),
        spark.read.parquet(s"$dir/lm"),
        spark.read.parquet(s"$dir/meta"))
  }

  /** Build the curation index for an initial corpus: URL keepers, the
    * dedup index over those keepers, and the LM trained on the corpus's
    * `targetLang` slice (frozen from here on — CCNet's production
    * semantics: the reference model does not drift with each shard). */
  def buildIndex(
      docs: DataFrame, id: Column, text: Column, url: Column, lang: Column,
      targetLang: String = "en"): CurateIndex = {
    val base = docs.select(id.as("doc_id"), text.as("__text"), url.as("__url"),
      lang.as("__lang"))
    val canon = base.withColumn("canonical_url", Url.canonicalize(col("__url")))
    val urlKeepers = canon.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keep_id"))
      .localCheckpoint()
    val keepers = canon.join(urlKeepers, Seq("canonical_url"))
      .filter(col("doc_id") === col("keep_id"))
    val dedupIdx = Dedup.buildIndex(keepers, col("doc_id"), col("__text"))
    val lm = LanguageModel.charNgramCounts(
      base.filter(col("__lang") === targetLang), col("__text"), n = 3)
      .localCheckpoint()
    val meta = base.agg(max(col("doc_id")).as("max_doc_id")).localCheckpoint()
    CurateIndex(dedupIdx, urlKeepers, lm, meta)
  }

  /** Curate a NEW shard against a persisted index without re-processing
    * the indexed corpus: the audit rows for the shard equal what a batch
    * [[curate]] over (indexed ∪ shard) with the index's frozen LM would
    * emit for those docs, PROVIDED shard ids exceed every indexed id (the
    * standard monotone-id contract — an older id arriving late could steal
    * URL/cluster keeper-ship from docs already shipped). The contract is
    * ENFORCED against the index's persisted watermark: a violating shard
    * raises instead of silently choosing different keepers.
    *
    *  - URL stage: the shard's canonical URLs min-merge into the keeper
    *    table (touched URLs only — id-keyed join, never a rescan);
    *  - near-dup stage: [[Dedup.dedupIncrement]] over the shard's URL
    *    keepers (old×old never re-examined, affected clusters only);
    *  - perplexity: scored under the FROZEN index LM;
    *  - split: keyed on the post-increment cluster id, so duplicate groups
    *    keep landing in one split even when a shard bridges clusters.
    *
    * Returns (audit rows for the shard, updated index).
    */
  def curateIncrement(
      newDocs: DataFrame, id: Column, text: Column, url: Column, lang: Column,
      index: CurateIndex, ceCap: Double = 1.13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)): (DataFrame, CurateIndex) = {
    val base = newDocs.select(id.as("doc_id"), text.as("__text"), url.as("__url"),
      lang.as("__lang"))
    Dedup.requireMonotoneIds("curateIncrement", base.select(col("doc_id")), index.meta)
    val canon = base.withColumn("canonical_url", Url.canonicalize(col("__url")))
    val newMin = canon.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("__new_min"))
    val touched = newMin
      .join(index.urlKeepers, Seq("canonical_url"), "left")
      .select(col("canonical_url"),
        when(col("keep_id").isNull, col("__new_min"))
          .otherwise(least(col("keep_id"), col("__new_min"))).as("keep_id"))
    val updatedUrlKeepers = index.urlKeepers
      .join(touched.select(col("canonical_url")), Seq("canonical_url"), "left_anti")
      .unionByName(touched)
      .localCheckpoint()
    val urlFlags = canon.join(touched, Seq("canonical_url"))
      .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("url_keeper"),
        col("__text"))
    val shardKeepers = urlFlags.filter(col("url_keeper"))
    val (assign, dedupIdx) = Dedup.dedupIncrement(
      shardKeepers, col("doc_id"), col("__text"), index.dedup)
    val ce = LanguageModel.crossEntropy(
      base, col("doc_id"), col("__text"), index.lm, n = 3)
      .select(col("doc_id"), col("cross_entropy"))
    val audit = auditSelect(
      base
        .join(urlFlags.select(col("doc_id"), col("url_keeper")), Seq("doc_id"))
        .join(assign.select(col("member_id").as("doc_id"),
          col("keep_id").as("cluster_id"),
          (col("member_id") === col("keep_id")).as("__dk")), Seq("doc_id"), "left")
        .join(ce, Seq("doc_id"), "left"),
      ceCap, splits)
    // shard max becomes the watermark (enforced above); empty shard keeps
    // the old one
    val shardMax = base.agg(max(col("doc_id")).as("max_doc_id")).localCheckpoint()
    val meta = if (shardMax.head().isNullAt(0)) index.meta else shardMax
    (audit, CurateIndex(dedupIdx, updatedUrlKeepers, index.lm, meta))
  }

  /** Versioned index store with an ATOMIC pointer commit — the metadata
    * trick that makes streaming increments exactly-once on a plain
    * filesystem: each commit writes the full index to a FRESH `v<batchId>`
    * directory (never overwriting what a lazy plan may still read), then
    * swings the single `CURRENT` pointer file by rename (atomic on POSIX
    * and HDFS), then deletes superseded versions. A crash anywhere leaves
    * either the old pointer (the batch replays against the old index) or
    * the new one (the batch is recorded as done) — never a half-state.
    * Single-writer by contract (one streaming query owns the store).
    */
  object CurateIndexStore {
    private def pointer(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/CURRENT")

    /** Initialize with the index of the seed corpus as version `v-1`. */
    def init(index: CurateIndex, dir: String): Unit = commitInternal(index, dir, -1L)

    /** (index, lastBatchId) at the current pointer. Hadoop's rename fails
      * on an existing destination, so the swing is delete-then-rename; a
      * crash inside that window leaves no CURRENT but a fully-written
      * CURRENT.tmp (the tmp is durable before the old pointer is touched)
      * — load() finishes the swing from the tmp in that case. */
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): (CurateIndex, Long) = {
      val fs = pointer(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p =
        if (fs.exists(pointer(dir))) pointer(dir)
        else {
          val tmp = new org.apache.hadoop.fs.Path(s"$dir/CURRENT.tmp")
          require(fs.exists(tmp), s"no CURRENT pointer (or staged tmp) under $dir")
          require(fs.rename(tmp, pointer(dir)), s"pointer recovery failed under $dir")
          pointer(dir)
        }
      val in = fs.open(p)
      val cur = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      val Array(ver, batch) = cur.split(":")
      (CurateIndex.load(spark, s"$dir/$ver"), batch.toLong)
    }

    /** Record `batchId` as incorporated. Call AFTER the batch's audit
      * output is durable — the pointer swing is the commit point. */
    def commit(index: CurateIndex, dir: String, batchId: Long): Unit =
      commitInternal(index, dir, batchId)

    private def commitInternal(index: CurateIndex, dir: String, batchId: Long): Unit = {
      val spark = index.urlKeepers.sparkSession
      val hconf = spark.sparkContext.hadoopConfiguration
      val fs = pointer(dir).getFileSystem(hconf)
      val ver = s"v$batchId"
      index.save(s"$dir/$ver")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/CURRENT.tmp")
      val out = fs.create(tmp, true)
      out.write(s"$ver:$batchId".getBytes("UTF-8")); out.close()
      val old: Option[String] =
        if (fs.exists(pointer(dir))) {
          val in = fs.open(pointer(dir))
          val s = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
          Some(s.split(":")(0))
        } else None
      fs.delete(pointer(dir), false)
      require(fs.rename(tmp, pointer(dir)), s"pointer swing failed for $ver")
      old.filter(_ != ver).foreach(o =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$o"), true))
    }
  }

  /** One streaming micro-batch = one [[curateIncrement]] shard, with
    * exactly-once semantics over replays:
    *  1. an already-committed batchId (≤ the pointer's) is a no-op — its
    *     audit was durable before the pointer swung;
    *  2. otherwise increment against the CURRENT index, overwrite the
    *     batch's audit dir (idempotent), and only then commit the updated
    *     index — a crash before the commit replays cleanly against the
    *     unchanged index.
    * The batch frame must carry (doc_id, text, url, lang).
    */
  def curateBatch(
      batch: DataFrame, batchId: Long, indexDir: String, outDir: String,
      ceCap: Double = 1.13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)): Unit = {
    val spark = batch.sparkSession
    val (idx, last) = CurateIndexStore.load(spark, indexDir)
    if (batchId <= last) return
    val (audit, updated) = curateIncrement(batch,
      col("doc_id"), col("text"), col("url"), col("lang"), idx, ceCap, splits)
    audit.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    CurateIndexStore.commit(updated, indexDir, batchId)
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
        col("quality_pass") && !cePass(col("cross_entropy"), ceCap)),
      "kept" -> cnt(col("kept")))
  }
}
