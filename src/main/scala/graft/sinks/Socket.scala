package graft.sinks

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket => JSocket}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.LongAccumulator

/** The reference's socket DESTINATIONS — `network()`/`syslog()`/`tcp()`/
  * `udp()` client drivers (reference `modules/afsocket/afsocket-dest.c`,
  * writer framing `lib/logproto/logproto-text-client.c` /
  * `logproto-framed-client.c`) re-expressed Spark-first:
  *
  *  - the line is a template → rendered as a Catalyst [[Column]] in the
  *    plan (whole-stage codegen), the sink only ships finished strings;
  *  - one connection per partition (`foreachPartition`) — parallelism =
  *    partition count, the socket analog of Http's worker pool;
  *  - framing mirrors the writer protos: `non-transparent` appends the
  *    `\n` suffix (text client), `octet-counted` prepends `LEN SP`
  *    (RFC6587 framed client — the syslog() driver's default);
  *  - `tls` wraps the stream in JSSE using [[graft.sources.Tls]]'s client
  *    context over a `ca-file()` PEM (server-auth, RFC5425);
  *  - `udp` sends one datagram per message (dgram client).
  *
  * Delivery matches the reference's plain socket drivers: at-least-once
  * under task retry, no application acks (its reliable path is
  * disk-buffer, ours is the file/table sinks).
  *
  * [[writeFailover]] adds the reference's `failover()` HA semantics
  * (`modules/afsocket/afinet-dest-failover.c`): an ordered server list
  * (primary first), connect-failure advance with wraparound, and the
  * optional failback mode — while connected to a secondary, the primary
  * is TCP-probed every `tcp-probe-interval()` (default 60 s, :50) and
  * after `successful-probes-required()` consecutive successes (default
  * 3, :51) traffic switches back (`_tcp_probe_succeeded`, :98).
  */
object Socket {

  def write(
      df: DataFrame,
      host: String,
      port: Int,
      line: Column,
      transport: String = "tcp", // tcp | udp | tls
      framing: String = "non-transparent", // non-transparent | octet-counted
      caFile: Option[String] = None): Long = {
    val sent: LongAccumulator =
      df.sparkSession.sparkContext.longAccumulator("socket_sent")
    val rendered = df.select(line.cast("string").as("line"))
    rendered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) transport match {
        case "udp" =>
          val sock = new DatagramSocket()
          val addr = InetAddress.getByName(host)
          try rows.foreach { r =>
            val b = r.getString(0).getBytes("UTF-8")
            sock.send(new DatagramPacket(b, b.length, addr, port))
            sent.add(1)
          } finally sock.close()
        case t =>
          val sock: JSocket =
            if (t == "tls")
              graft.sources.Tls.clientContext(caFile.getOrElse(
                sys.error("socket sink: transport tls needs caFile")))
                .getSocketFactory.createSocket(host, port)
            else new JSocket(host, port)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          try {
            rows.foreach { r =>
              val b = r.getString(0).getBytes("UTF-8")
              if (framing == "octet-counted") {
                out.write(s"${b.length} ".getBytes("US-ASCII"))
                out.write(b)
              } else {
                out.write(b)
                out.write('\n')
              }
              sent.add(1)
            }
            out.flush()
          } finally sock.close()
      }
    }
    sent.value
  }

  /** `network()/syslog()` destination with `failover()` servers. Streaming
    * transports only (tcp/tls — the reference's failover is an afinet
    * STREAM feature; datagrams have no connect failure to advance on).
    *
    * The redelivery unit is a BATCH of `batchLines` rows held in memory:
    * rows are framed and flushed per batch, and an IOException anywhere in
    * a batch reconnects (advancing through the server list, one full cycle
    * + bounded backoff retries, then task failure) and resends the WHOLE
    * batch — at-least-once, bounded memory, and the failure window of a
    * killed connection is the in-flight batch, which is retried rather
    * than lost (the reference re-queues its in-flight message the same
    * way).
    *
    * Returns (sent_rows, servers_used) — the latter for observability: a
    * clean primary-only run reports 1.
    */
  def writeFailover(
      df: DataFrame,
      servers: Seq[(String, Int)],
      line: Column,
      transport: String = "tcp", // tcp | tls
      framing: String = "non-transparent",
      caFile: Option[String] = None,
      batchLines: Int = 100,
      connectRetries: Int = 3,
      failback: Boolean = false,
      probeIntervalMs: Long = 60000L, // reference tcp-probe-interval() 60 s
      probesRequired: Int = 3, // reference successful-probes-required()
      connectTimeoutMs: Int = 2000): (Long, Long) = {
    require(servers.nonEmpty, "failover sink needs at least one server")
    require(transport == "tcp" || transport == "tls",
      s"failover is a stream-transport feature (tcp/tls), got $transport")
    val sc = df.sparkSession.sparkContext
    val sent: LongAccumulator = sc.longAccumulator("socket_sent")
    val usedServers: LongAccumulator = sc.longAccumulator("socket_servers_used")
    val serverList = servers.toList
    val rendered = df.select(line.cast("string").as("line"))

    rendered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val tlsFactory =
          if (transport == "tls")
            Some(graft.sources.Tls.clientContext(caFile.getOrElse(
              sys.error("socket sink: transport tls needs caFile"))).getSocketFactory)
          else None

        def connectTo(i: Int): JSocket = {
          val (h, p) = serverList(i)
          tlsFactory match {
            case Some(f) =>
              // JSSE socket factory has no connect-timeout ctor: layer TLS
              // over a timed plain connect
              val plain = new JSocket()
              plain.connect(new java.net.InetSocketAddress(h, p), connectTimeoutMs)
              f.createSocket(plain, h, p, true).asInstanceOf[JSocket]
            case None =>
              val s = new JSocket()
              s.connect(new java.net.InetSocketAddress(h, p), connectTimeoutMs)
              s
          }
        }

        val (n, used) = sendFailover(rows.map(_.getString(0)), serverList.size,
          connectTo, framing, batchLines, connectRetries, failback,
          probeIntervalMs, probesRequired)
        sent.add(n)
        usedServers.add(used.toLong)
      }
    }
    (sent.value, usedServers.value)
  }

  /** The per-worker failover state machine — extracted so specs can drive
    * it with a fake clock and controlled connects. Returns
    * (rows_sent, distinct_servers_used). */
  private[graft] def sendFailover(
      rows: Iterator[String],
      serverCount: Int,
      connectTo: Int => JSocket,
      framing: String,
      batchLines: Int,
      connectRetries: Int,
      failback: Boolean,
      probeIntervalMs: Long,
      probesRequired: Int,
      clock: () => Long = () => System.currentTimeMillis()): (Long, Int) = {
    var current = 0 // primary
    val seen = scala.collection.mutable.Set.empty[Int]
    var sock: JSocket = null
    var out: java.io.BufferedOutputStream = null
    var sent = 0L

    /** `afinet_dd_failover_next`: advance through the list (wrapping)
      * until a connect succeeds; a full failed cycle backs off and
      * retries `connectRetries` times, then fails the task. */
    def connectCurrent(): Unit = {
      var cycle = 0
      var attempt = 0
      var done = false
      while (!done) {
        try {
          sock = connectTo(current)
          out = new java.io.BufferedOutputStream(sock.getOutputStream)
          seen += current
          done = true
        } catch {
          case e: java.io.IOException =>
            current = (current + 1) % serverCount
            cycle += 1
            if (cycle >= serverCount) {
              cycle = 0
              attempt += 1
              if (attempt > connectRetries)
                throw new java.io.IOException(
                  s"socket failover: no server reachable after $connectRetries cycles " +
                    s"over $serverCount servers", e)
              Thread.sleep(50L << math.min(attempt, 6))
            }
        }
      }
    }

    def closeQuietly(): Unit = {
      if (sock != null) { try sock.close() catch { case _: java.io.IOException => } }
      sock = null; out = null
    }

    var lastProbe = 0L
    var probeSuccesses = 0
    /** Failback: while off-primary, TCP-probe the primary once per
      * interval; `probesRequired` consecutive successes switch back
      * (reference `_failback_timer_elapsed`/`_tcp_probe_succeeded`). */
    def maybeFailback(): Unit =
      if (failback && current != 0) {
        val now = clock()
        if (now - lastProbe >= probeIntervalMs) {
          lastProbe = now
          val ok =
            try { connectTo(0).close(); true }
            catch { case _: java.io.IOException => false }
          probeSuccesses = if (ok) probeSuccesses + 1 else 0
          if (probeSuccesses >= probesRequired) {
            probeSuccesses = 0
            closeQuietly()
            current = 0
            connectCurrent()
          }
        }
      }

    def frame(b: Array[Byte], o: java.io.OutputStream): Unit =
      if (framing == "octet-counted") {
        o.write(s"${b.length} ".getBytes("US-ASCII")); o.write(b)
      } else { o.write(b); o.write('\n') }

    connectCurrent()
    try {
      rows.grouped(batchLines).foreach { batch =>
        maybeFailback()
        val payload = batch.map(_.getBytes("UTF-8"))
        var delivered = false
        while (!delivered) {
          try {
            payload.foreach(frame(_, out))
            out.flush()
            delivered = true
          } catch {
            case _: java.io.IOException =>
              // connection died mid-batch: advance and resend the batch
              closeQuietly()
              current = (current + 1) % serverCount
              connectCurrent()
          }
        }
        sent += batch.size
      }
    } finally closeQuietly()
    (sent, seen.size)
  }
}
