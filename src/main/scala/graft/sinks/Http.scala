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
  *  - response handling mirrors `http_dd_process_response`: 2xx success,
  *    4xx "disconnect&drop" (the message is not retryable — count and move
  *    on), 5xx/transport error retried `retries` times with backoff, then
  *    the task fails → Spark re-runs the task (the reference re-queues to
  *    its fifo; delivery is at-least-once in both engines).
  *
  * Returns (delivered_messages, dropped_messages) from accumulators.
  *
  * Scale: requests fan out from executors, not the driver; there is no
  * driver-side collect. Endpoint capacity is the only ceiling, as with the
  * reference's worker pool.
  */
object Http {

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
              case Right(s) if s < 500 =>
                // 1xx/3xx/4xx: not retryable — drop and continue, like the
                // reference's default response action for non-2xx/non-5xx
                dropped.add(batch.size); done = true
              case other => // 5xx or transport error: retry with backoff
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
