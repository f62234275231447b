package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.corpus.{Dedup, Pii, TextStats}

/** One streamed document (arrival-ordered corpus intake). */
final case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

/** One streamed document with curation inputs (url + language). */
final case class CurateDoc(doc_id: Long, text: String, url: String, lang: String)

/** One streamed embedding row (ANN index intake). */
final case class VecDoc(vec_id: Long, vec: Seq[Double])

/** Dedup decision for one streamed document. */
final case class StreamDedup(
    doc_id: Long,
    content_hash: String,
    is_first: Boolean,
    keeper_id: Long,
    n_seen_before: Long,
    ts: Timestamp)

/** Streaming corpus intake — the curation gates run over an unbounded
  * document stream the way the log pipeline runs over turns:
  *
  *  - the SCAN-STAGE gates (Gopher/C4 quality, language ID, PII redaction)
  *    are the identical batch `Column`s — narrow transforms are
  *    streaming-safe, so [[gate]] simply applies them to a readStream
  *    frame;
  *  - cross-batch EXACT DEDUP is the stateful piece: keyed by
  *    [[Dedup.contentHash]], first arrival wins, later copies are flagged
  *    with the keeper id ([[dedupStream]]). In-batch arrival order is made
  *    deterministic by (ts, doc_id) — stage retries and the batch operator
  *    agree on the keeper.
  *
  * State contract at scale: one state row per DISTINCT content. The
  * event-time timeout expires a hash's state `ttl` after its LAST
  * arrival's event time passes the watermark — bounded state for streams
  * whose duplicates cluster in time (crawl re-fetches), exactly the
  * trade-off of the reference's suppress() window; a re-arrival after
  * expiry restarts as first (documented, same as suppress).
  */
object CorpusStream {

  /** Quality + PII gate as one streaming-safe projection: input columns +
    * (quality_pass, lang, redacted_text). */
  def gate(docs: DataFrame): DataFrame =
    docs.withColumns(Map(
      "quality_pass" -> TextStats.gopherQuality(col("text")).getField("pass"),
      "lang" -> TextStats.langId(col("text")),
      "redacted_text" -> Pii.redact(col("text"))))

  /** Streaming INCREMENTAL curation: each micro-batch is one
    * [[graft.corpus.Curate.curateIncrement]] shard against the versioned
    * [[graft.corpus.Curate.CurateIndexStore]] — audits land per batch
    * under `outDir/batch=<id>`, the index advances by atomic pointer
    * commit, and replayed batches are no-ops (exactly-once; see
    * [[graft.corpus.Curate.curateBatch]]). The stream must carry
    * (doc_id, text, url, lang); start with a checkpointLocation. */
  def curateStream(
      docs: DataFrame, indexDir: String, outDir: String,
      ceCap: Double = 1.13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.corpus.Curate.curateBatch(b.toDF(), id, indexDir, outDir, ceCap, splits)
    }

  /** Streaming ANN-index intake: each micro-batch of `(vec_id, vec)` rows
    * is one [[graft.corpus.Similarity.AnnIndexStore.annBatch]] shard —
    * encoded against the store's FROZEN quantizers, committed O(shard) by
    * atomic pointer swing, exactly-once over replays. Seed the store with
    * [[graft.corpus.Similarity.AnnIndexStore.init]] first; start with a
    * checkpointLocation. */
  def annStream(vecs: DataFrame, indexDir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.corpus.Similarity.AnnIndexStore.annBatch(
          b.toDF(), id, indexDir, col("vec_id"), col("vec"))
    }

  /** Cross-batch exact dedup over a document stream. State for a hash is
    * dropped once the watermark passes its last arrival + `ttlSeconds`. */
  def dedupStream(
      docs: Dataset[StreamDoc], watermark: String = "1 hour",
      ttlSeconds: Long = 3600L): Dataset[StreamDedup] = {
    val ttlMillis = ttlSeconds * 1000L
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark("ts", watermark)
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .as[(Long, String, Timestamp, String)](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.TIMESTAMP, Encoders.STRING))
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (hash: String, rows: Iterator[(Long, String, Timestamp, String)],
         state: GroupState[(Long, Long, Long)]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq.sortBy(r => (r._3.getTime, r._1))
            var (keeper, seen, lastTs) =
              state.getOption.getOrElse((-1L, 0L, Long.MinValue))
            val out = batch.iterator.map { case (id, _, t, _) =>
              val first = seen == 0L
              if (first) keeper = id
              val d = StreamDedup(id, hash, first, keeper, seen, t)
              seen += 1
              lastTs = math.max(lastTs, t.getTime)
              d
            }.toVector
            state.update((keeper, seen, lastTs))
            state.setTimeoutTimestamp(math.max(
              lastTs + ttlMillis,
              state.getCurrentWatermarkMs + 1))
            out.iterator
          }
        })
  }
}
