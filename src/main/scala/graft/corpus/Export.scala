package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the last step of a curation pipeline: a
  * DETERMINISTIC global shuffle (training order must not correlate with
  * crawl/source order, but stage retries and re-runs must reproduce the
  * identical shards bit-for-bit, the repo's no-rand() rule), balanced
  * shard assignment, and a manifest that makes the export verifiable and
  * resumable.
  *
  *  - `shard` = first-8-md5-hex of the id mod `nShards` — uniform over
  *    shards regardless of id distribution (sequential ids, skewed
  *    sources), so shard sizes concentrate tightly around n/N;
  *  - the within-shard order key is an INDEPENDENT md5 of the id
  *    (different tag), so order within a shard is itself a uniform
  *    shuffle, uncorrelated with the shard draw;
  *  - `shard_pos` is the rank under that key — one window per shard; at
  *    scale parallelism = `nShards` (exports use 2^10..2^14 shards, which
  *    is also what bounds per-task sort memory);
  *  - the manifest rows (shard, n_docs, checksum) use an ORDER-FREE
  *    checksum (sum of the 32-bit order-key prefixes) so any engine can
  *    recompute it from the written files without re-sorting.
  *
  * [[writeShards]] writes one directory per shard (partitionBy) with rows
  * pre-sorted by the order key, plus `_manifest` parquet;
  * [[verifyShards]] recomputes counts + checksums from the written files
  * and reports per-shard agreement — the integrity check a resumable
  * exporter runs before skipping completed work.
  */
object Export {

  private def hex32(tag: String, id: Column): Column =
    conv(substring(md5(concat(lit(tag), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Deterministic shard + order columns: (shard int, shard_pos long). */
  def shardAssignment(docs: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumns(Map(
        "shard" -> pmod(hex32("shard:", id), lit(nShards.toLong)).cast("int"),
        "__ok" -> hex32("order:", id)))
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__ok").asc, id.asc)).cast("long"))
  }

  /** Write shards + manifest. Returns the manifest frame (shard, n_docs,
    * checksum). */
  def writeShards(
      docs: DataFrame, id: Column, nShards: Int, outDir: String): DataFrame = {
    val assigned = shardAssignment(docs, id, nShards)
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ok"), id)
      .drop("__ok")
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/data")
    val manifest = assigned
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ok")).as("checksum"))
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** One training JSONL line per row — the interchange format most
    * training stacks ingest. Fixed key order = argument order; rendering
    * is the engine's JSON marshal (standard `\"`/`\\`/`\n` escapes,
    * unquoted ints/bools), so the line is byte-stable across reruns.
    * Avoid null fields (Spark's marshal omits them — same rule as the
    * FilterX dict stores) and avoid doubles where byte-identity across
    * engines matters (shortest-repr deltas, declared at format_json). */
  def jsonlLine(fields: (String, Column)*): Column =
    to_json(struct(fields.map { case (n, c) => c.as(n) }: _*))

  /** JSONL shard export: the same deterministic shuffle + verifiable
    * manifest as [[writeShards]], with plain-text `.jsonl` data files
    * (one directory per shard, rows pre-sorted by the order key). */
  def writeJsonlShards(
      docs: DataFrame, id: Column, nShards: Int, outDir: String,
      fields: (String, Column)*): DataFrame = {
    val assigned = shardAssignment(docs, id, nShards)
      .withColumn("__line", jsonlLine(fields: _*))
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ok"), id)
      .select(col("__line"), col("shard"))
      .write.mode("overwrite").partitionBy("shard").text(s"$outDir/data")
    val manifest = assigned
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ok")).as("checksum"))
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** Takedown / retraction propagation — the compliance pass a published
    * export needs when erasure requests (GDPR/DMCA takedowns, robots
    * `noai` opt-outs) arrive AFTER shards were written: compute the
    * MINIMAL re-export. Because [[shardAssignment]] derives shard and
    * order keys from each id alone, removing documents never moves a
    * surviving document to a different shard and never reorders two
    * survivors — so only the shards that actually CONTAIN a retracted id
    * need rebuilding, and their rebuilt contents equal a full re-export
    * of (docs − retracted) restricted to those shards (pinned by the
    * CorpusSpec equivalence property).
    *
    * Scale shape: the retraction list is takedown-sized, so its shard set
    * and id set both broadcast; corpus-wide work is one scan-stage shard
    * assignment + a broadcast semi-join (shard) + broadcast anti-join
    * (id). Only the affected fraction (≤ |retractions|/nShards of the
    * corpus) flows into the re-ranking window. Untouched shards are never
    * read, shuffled, or rewritten.
    *
    * @return surviving rows of the affected shards with recomputed
    *         `shard` + `shard_pos` (write with partitionBy("shard") over
    *         the old shard dirs; recompute manifest rows with the
    *         [[writeShards]] aggregate)
    */
  def retract(
      docs: DataFrame, id: Column,
      retracted: DataFrame, retractedId: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val r = retracted.select(retractedId.cast("string").as("__rid")).distinct()
      .withColumn("shard",
        pmod(hex32("shard:", col("__rid")), lit(nShards.toLong)).cast("int"))
    val affected = r.select(col("shard")).distinct()
    docs
      .withColumns(Map(
        "shard" -> pmod(hex32("shard:", id), lit(nShards.toLong)).cast("int"),
        "__ok" -> hex32("order:", id)))
      .join(broadcast(affected), Seq("shard"), "left_semi")
      .join(broadcast(r.select(col("__rid"))),
        id.cast("string") === col("__rid"), "left_anti")
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__ok").asc, id.asc)).cast("long"))
      .drop("__ok")
  }

  /** Corpus snapshot diff — the change report between two dataset
    * versions an iterative corpus build publishes with each release:
    * per doc id, `added` (new only), `removed` (old only), `changed`
    * (both, content hash differs) or `unchanged`. Content compared via
    * [[Dedup.contentHash]] (normalized sha-256), so formatting-identical
    * re-crawls do not read as changes.
    *
    * Scale shape: hashes are computed scan-stage on both sides, then ONE
    * id-keyed full outer join — no content ever shuffles, only
    * (id, hash) pairs.
    */
  def snapshotDiff(
      old: DataFrame, oldId: Column, oldText: Column,
      cur: DataFrame, curId: Column, curText: Column): DataFrame = {
    val o = old.select(oldId.as("doc_id"), Dedup.contentHash(oldText).as("__oh"))
    val c = cur.select(curId.as("doc_id"), Dedup.contentHash(curText).as("__ch"))
    o.join(c, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__oh").isNull, lit("added"))
          .when(col("__ch").isNull, lit("removed"))
          .when(col("__oh") =!= col("__ch"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Recompute counts + checksums from the written files and compare to
    * the manifest: (shard, n_docs, checksum, ok). A shard missing from the
    * data side reports ok=false with null recomputed fields. */
  def verifyShards(spark: SparkSession, id: Column, outDir: String): DataFrame = {
    val manifest = spark.read.parquet(s"$outDir/_manifest")
    val actual = spark.read.parquet(s"$outDir/data")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("__n"), sum(hex32("order:", id)).as("__ck"))
    manifest.join(actual, Seq("shard"), "left")
      .select(col("shard"), col("n_docs"), col("checksum"),
        (col("__n").isNotNull && col("__n") === col("n_docs") &&
          col("__ck") === col("checksum")).as("ok"))
  }
}
