package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.LongAccumulator

/** The reference's `http()` destination (reference `modules/http/http-dest.c`,
  * worker pool `http-dest-worker.c`, batching `http-dest.c:batch-lines` /
  * `batch-bytes`) re-expressed Spark-first:
  *
  *  - the BODY is a template → we render it as a Catalyst [[Column]] in the
  *    plan (whole-stage codegen formats every message); the sink action only
  *    ever sees finished strings — no per-row template evaluation inside the
  *    I/O loop;
  *  - `workers(n)` → Spark tasks: each partition is one worker with its own
  *    connection (`foreachPartition`), so parallelism = partition count;
  *  - `batch-lines(n)` → consecutive rows of a partition joined with
  *    `delimiter` into one request body (reference http-dest batching);
  *  - response handling mirrors `default_map_http_status_to_worker_status`
  *    (reference `modules/http/http-worker.c:395` and the per-class helpers
  *    at 321-392): 2xx → delivered; the reference's DROP set
  *    {410,416,422,424,425,451,508} → counted dropped, never retried;
  *    its ERROR set {102,103,304,428,504, unknown ≥600} → retried with
  *    backoff up to `retries` then DROPPED (the reference consumes
  *    per-message retries then drops); everything else (most 1xx/3xx/4xx/
  *    5xx, transport errors) → NOT_CONNECTED: reconnect-and-retry, which in
  *    batch is retry-with-backoff then TASK FAILURE so Spark re-runs the
  *    task (the reference re-queues to its fifo; delivery is at-least-once
  *    in both engines).
  *
  * Returns (delivered_messages, dropped_messages) from accumulators.
  *
  * Scale: requests fan out from executors, not the driver; there is no
  * driver-side collect. Endpoint capacity is the only ceiling, as with the
  * reference's worker pool.
  */
object Http {

  /** Statuses the reference drops outright (`_default_4XX` drops list +
    * `_default_5XX`'s 508, http-worker.c:368,385). */
  private val HardDrop = Set(410, 416, 422, 424, 425, 451, 508)

  /** Statuses the reference maps to LTR_ERROR — retried on a per-message
    * budget, then dropped (http-worker.c:330,348,364,389; unknown classes
    * ≥600 also fall out as LTR_ERROR, :398,412). */
  private def ErrorRetry(s: Int): Boolean =
    s == 102 || s == 103 || s == 304 || s == 428 || s == 504 || s >= 600

  def write(
      df: DataFrame,
      url: String,
      body: Column,
      batchLines: Int = 1,
      delimiter: String = "\n",
      headers: Map[String, String] = Map.empty,
      method: String = "POST",
      retries: Int = 3,
      timeoutMs: Int = 10000): (Long, Long) = {
    val spark = df.sparkSession
    val delivered: LongAccumulator = spark.sparkContext.longAccumulator("http_delivered")
    val dropped: LongAccumulator = spark.sparkContext.longAccumulator("http_dropped")
    val rendered = df.select(body.cast("string").as("body"))

    rendered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(timeoutMs)).build()
        // a null-rendered body is an undeliverable message: counted dropped,
        // never silently vanished (delivered + dropped covers every row)
        val bodies = rows.map(_.getString(0)).filter { b =>
          if (b == null) { dropped.add(1); false } else true
        }
        bodies.grouped(batchLines).foreach { batch =>
          val payload = batch.mkString(delimiter)
          var attempt = 0
          var done = false
          while (!done) {
            val req = {
              val b = HttpRequest.newBuilder(URI.create(url))
                .timeout(Duration.ofMillis(timeoutMs))
                .method(method, HttpRequest.BodyPublishers.ofString(payload))
              headers.foreach { case (k, v) => b.header(k, v) }
              b.build()
            }
            val status =
              try Right(client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode())
              catch { case e: java.io.IOException => Left(e) }
            status match {
              case Right(s) if s >= 200 && s < 300 =>
                delivered.add(batch.size); done = true
              case Right(s) if HardDrop(s) =>
                // reference LTR_DROP: the message can never succeed
                dropped.add(batch.size); done = true
              case Right(s) if ErrorRetry(s) =>
                // reference LTR_ERROR: per-message retry budget, then drop
                attempt += 1
                if (attempt > retries) { dropped.add(batch.size); done = true }
                else Thread.sleep(50L << math.min(attempt, 6))
              case other =>
                // reference LTR_NOT_CONNECTED (most 1xx/3xx/4xx/5xx and
                // transport errors): reconnect-and-retry; exhausted → task
                // failure so Spark redelivers the partition (at-least-once)
                attempt += 1
                if (attempt > retries) {
                  val why = other.fold(_.toString, s => s"HTTP $s")
                  throw new java.io.IOException(
                    s"http sink: $why after $retries retries for $url")
                }
                Thread.sleep(50L << math.min(attempt, 6))
            }
          }
        }
      }
    }
    (delivered.value, dropped.value)
  }
}
