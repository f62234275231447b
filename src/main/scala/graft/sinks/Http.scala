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
  *  - `url("a" "b" …)` → [[LoadBalancer]]: the reference's multi-URL target
  *    rotation with failure tracking and timed recovery
  *    (`modules/http/http-loadbalancer.c`), shared per executor JVM the way
  *    the reference shares one balancer across its worker pool;
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
  *    in both engines). Like the reference's `_flush` loop
  *    (`http-worker.c:725-795`), every non-2xx attempt marks the TARGET
  *    failed and retries the batch on an alternative target (at most one
  *    pass over the target list per attempt) before the per-message ladder
  *    above applies.
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

  /** Multi-URL target rotation — the reference's HTTPLoadBalancer
    * (`modules/http/http-loadbalancer.c`) semantics:
    *
    *  - every worker (client) is pinned to a target; operational targets
    *    share the workers evenly (`max_clients` = clients/operational,
    *    remainder to the lowest indexes — `_recalculate_clients_per_target_
    *    goals`, :197);
    *  - a worker over its target's budget (or whose target failed) moves to
    *    the next operational target round-robin from its current index + 1
    *    (`_locate_target`, :295);
    *  - a send failure marks the target FAILED (out of rotation) and stamps
    *    the failure time (`set_target_failed`, :366); a success re-admits
    *    it (`set_target_successful`, :382);
    *  - while failed targets exist, one recovery probe per
    *    `recoveryTimeoutMs` routes a real batch to the least-recently-
    *    failed target (`_check_recovery`/`_recover_a_failed_target`, :273);
    *  - all targets failed → the least-recently-failed one is chosen
    *    anyway (`_locate_target`'s fallthrough) so traffic keeps probing.
    *
    * Thread-safe (one lock, like the reference's GMutex); shared across
    * the executor's tasks via [[LoadBalancer.forTargets]].
    */
  final class LoadBalancer(
      val urls: Seq[String], recoveryTimeoutMs: Long,
      clock: () => Long = () => System.currentTimeMillis()) {
    require(urls.nonEmpty, "http load balancer needs at least one url")

    final class Target private[LoadBalancer] (val url: String, val index: Int) {
      private[LoadBalancer] var failed = false
      private[LoadBalancer] var clients = 0
      private[LoadBalancer] var maxClients = 0
      private[LoadBalancer] var lastFailureMs = 0L
    }
    final class Client private[LoadBalancer] () {
      private[LoadBalancer] var target: Target = null
    }

    private val targets: Array[Target] =
      urls.zipWithIndex.map { case (u, i) => new Target(u, i) }.toArray
    private var numClients = 0
    private var numFailed = 0
    private var lastRecoveryAttemptMs = 0L

    def numTargets: Int = targets.length

    /** `_recalculate_clients_per_target_goals` — spread clients evenly
      * over operational targets. */
    private def recalc(): Unit = {
      val operational = targets.length - numFailed
      if (operational > 0) {
        val per = numClients / operational
        var rem = numClients % operational
        targets.foreach { t =>
          if (!t.failed) {
            t.maxClients = per + (if (rem > 0) { rem -= 1; 1 } else 0)
          }
        }
      }
    }

    def registerClient(): Client = synchronized {
      numClients += 1; recalc(); new Client()
    }

    def releaseClient(c: Client): Unit = synchronized {
      numClients -= 1
      if (c.target != null) { c.target.clients -= 1; c.target = null }
      recalc()
    }

    private def leastRecentlyFailed(): Target = {
      var best: Target = null
      targets.foreach { t =>
        if (t.failed && (best == null || t.lastFailureMs < best.lastFailureMs))
          best = t
      }
      if (best == null) targets(0) else best
    }

    private def locate(c: Client): Target = {
      val start = if (c.target == null) 0 else (c.target.index + 1) % targets.length
      var i = 0
      while (i < targets.length) {
        val t = targets((i + start) % targets.length)
        if (!t.failed && t.clients < t.maxClients) return t
        i += 1
      }
      lastRecoveryAttemptMs = clock()
      leastRecentlyFailed()
    }

    private def switchTo(c: Client, t: Target): Unit =
      if (c.target ne t) {
        if (c.target != null) c.target.clients -= 1
        t.clients += 1
        c.target = t
      }

    /** `http_load_balancer_choose_target`: recovery probe first, then
      * rebalance if the pinned target is failed/over-budget. */
    def choose(c: Client): Target = synchronized {
      if (numFailed > 0) {
        val now = clock()
        if (lastRecoveryAttemptMs == 0L) lastRecoveryAttemptMs = now
        if (now - lastRecoveryAttemptMs >= recoveryTimeoutMs) {
          lastRecoveryAttemptMs = now
          switchTo(c, leastRecentlyFailed())
          return c.target
        }
      }
      if (c.target == null || c.target.failed || c.target.clients > c.target.maxClients)
        switchTo(c, locate(c))
      c.target
    }

    def fail(t: Target): Unit = synchronized {
      if (!t.failed) { t.failed = true; numFailed += 1; recalc() }
      t.lastFailureMs = clock()
    }

    def success(t: Target): Unit = synchronized {
      if (t.failed) { t.failed = false; numFailed -= 1; recalc() }
    }

    /** Test/introspection hook: urls currently out of rotation. */
    def failedUrls: Seq[String] = synchronized {
      targets.filter(_.failed).map(_.url).toSeq
    }
  }

  object LoadBalancer {
    private val registry =
      new java.util.concurrent.ConcurrentHashMap[(Seq[String], Long), LoadBalancer]()

    /** One balancer per (url list, recovery timeout) per JVM — the Spark
      * analog of the reference's one balancer per destination shared by
      * its worker pool: on an executor every task over these targets sees
      * the same rotation state. */
    def forTargets(urls: Seq[String], recoveryTimeoutMs: Long): LoadBalancer =
      registry.computeIfAbsent((urls, recoveryTimeoutMs),
        _ => new LoadBalancer(urls, recoveryTimeoutMs))
  }

  /** Single-URL form (the common config). */
  def write(
      df: DataFrame,
      url: String,
      body: Column,
      batchLines: Int = 1,
      delimiter: String = "\n",
      headers: Map[String, String] = Map.empty,
      method: String = "POST",
      retries: Int = 3,
      timeoutMs: Int = 10000): (Long, Long) =
    writeBalanced(df, Seq(url), body, batchLines, delimiter, headers, method,
      retries, timeoutMs)

  /** Multi-URL form — the reference's `url("a" "b" …)` with target
    * failover/recovery. */
  def writeBalanced(
      df: DataFrame,
      urls: Seq[String],
      body: Column,
      batchLines: Int = 1,
      delimiter: String = "\n",
      headers: Map[String, String] = Map.empty,
      method: String = "POST",
      retries: Int = 3,
      timeoutMs: Int = 10000,
      recoveryTimeoutMs: Long = 60000L): (Long, Long) = {
    val spark = df.sparkSession
    val delivered: LongAccumulator = spark.sparkContext.longAccumulator("http_delivered")
    val dropped: LongAccumulator = spark.sparkContext.longAccumulator("http_dropped")
    val rendered = df.select(body.cast("string").as("body"))
    val urlList = urls.toList

    rendered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val lb = LoadBalancer.forTargets(urlList, recoveryTimeoutMs)
        val client = lb.registerClient()
        val http = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(timeoutMs)).build()
        try {
          // a null-rendered body is an undeliverable message: counted
          // dropped, never silently vanished (delivered + dropped covers
          // every row)
          val bodies = rows.map(_.getString(0)).filter { b =>
            if (b == null) { dropped.add(1); false } else true
          }

          def sendOnce(url: String, payload: String): Either[Throwable, Int] = {
            val req = {
              val b = HttpRequest.newBuilder(URI.create(url))
                .timeout(Duration.ofMillis(timeoutMs))
                .method(method, HttpRequest.BodyPublishers.ofString(payload))
              headers.foreach { case (k, v) => b.header(k, v) }
              b.build()
            }
            try Right(http.send(req, HttpResponse.BodyHandlers.discarding()).statusCode())
            catch { case e: java.io.IOException => Left(e) }
          }

          bodies.grouped(batchLines).foreach { batch =>
            val payload = batch.mkString(delimiter)
            var attempt = 0
            var done = false
            while (!done) {
              // one `_flush`: walk the rotation (≤ numTargets sends),
              // marking failed targets out, until a send succeeds or no
              // alternative remains
              var target = lb.choose(client)
              var result = sendOnce(target.url, payload)
              var walks = lb.numTargets - 1
              while (!result.exists(s => s >= 200 && s < 300) && walks > 0) {
                lb.fail(target)
                val alt = lb.choose(client)
                if (alt eq target) walks = 0
                else {
                  target = alt
                  result = sendOnce(target.url, payload)
                  walks -= 1
                }
              }
              // the reference marks EVERY failing attempt's target, the
              // last one included (`set_target_failed` before the loop's
              // alt-choose); a later success re-admits it
              if (!result.exists(s => s >= 200 && s < 300)) lb.fail(target)
              result match {
                case Right(s) if s >= 200 && s < 300 =>
                  lb.success(target)
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
                  // transport errors): reconnect-and-retry; exhausted →
                  // task failure so Spark redelivers the partition
                  // (at-least-once)
                  attempt += 1
                  if (attempt > retries) {
                    val why = other.fold(_.toString, s => s"HTTP $s")
                    throw new java.io.IOException(
                      s"http sink: $why after $retries retries for ${target.url}")
                  }
                  Thread.sleep(50L << math.min(attempt, 6))
              }
            }
          }
        } finally lb.releaseClient(client)
      }
    }
    (delivered.value, dropped.value)
  }
}
