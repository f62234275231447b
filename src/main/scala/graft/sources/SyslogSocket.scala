package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Live socket sources — the reference's `network()` / `syslog()` / `tcp()` /
  * `udp()` drivers (reference `modules/afsocket/afsocket-plugin.c:33-113`,
  * socket server `modules/afsocket/afsocket-source.c`) as a Spark
  * DataSource V2 micro-batch stream:
  *
  * {{{
  * spark.readStream.format("syslog-socket")
  *   .option("port", "6514")          // 0 = ephemeral, see boundPort()
  *   .option("transport", "tcp")      // tcp | udp
  *   .option("framing", "auto")       // auto | octet-counted | non-transparent
  *   .load()                          // record, peer, ok, recv_ts
  * }}}
  *
  * Framing mirrors the reference's LogProto servers: RFC6587 octet counting
  * (`lib/logproto/logproto-framed-server.c:145-190`), newline/NUL
  * non-transparent records (`logproto-text-server.c`), and per-connection
  * auto-detection — first byte a digit selects octet counting — like
  * `logproto-auto-server.c`. UDP is datagram framing: one packet, one
  * message (`lib/logproto/logproto-dgram-server.c`). A malformed
  * octet-count header emits one `ok=false` row with the unparsed prefix and
  * closes the connection, as the framed server does.
  *
  * '''Execution model and scale.''' The listener binds on the DRIVER — the
  * same topology as the reference daemon, which is one process accepting
  * every connection; received frames are handed to executors per
  * micro-batch (rows ride the `InputPartition`s, split across
  * `spark.default.parallelism` so parse/enrich work distributes). A single
  * listener is the throughput ceiling of any socket server; the 100 TB
  * path is N ingest hosts each running one listener that spools framed
  * bytes to shared storage (then [[Framing]] explodes them with per-file
  * parallelism) or a partitioned queue. This source is the live-tail
  * equivalent for the protocols, with identical framing semantics.
  *
  * '''Delivery.''' Socket bytes are not replayable: rows buffered but not
  * yet committed are lost on restart — exactly the reference's contract
  * for plain tcp()/udp() without disk-buffer (at-most-once; its reliable
  * path spools to diskq first, ours spools to files first). Within a run,
  * offsets are exact: each committed batch is served once.
  */
final class SyslogSocketProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "syslog-socket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyslogSocket.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SyslogSocketTable(new CaseInsensitiveStringMap(properties))
}

private final class SyslogSocketTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"syslog-socket(:${options.getInt("port", 0)})"
  override def schema(): StructType = SyslogSocket.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SyslogSocket.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SyslogSocketStream(
            port = options.getInt("port", 0),
            transport = options.getOrDefault("transport", "tcp"),
            framing = options.getOrDefault("framing", "auto"),
            maxMsgSize = options.getInt("max-msg-size", 8 * 1024 * 1024),
            name = Option(options.get("name")),
            parallelism = options.getInt("partitions", 4),
            path = Option(options.get("path")),
            tls =
              if (options.get("key-file") == null && options.get("keystore") == null) None
              else Some(() => Tls.serverTls(
                keyFile = Option(options.get("key-file")),
                certFile = Option(options.get("cert-file")),
                keystore = Option(options.get("keystore")),
                keystorePassword = options.getOrDefault("keystore-password", ""),
                keyPassword = Option(options.get("key-password")),
                peerVerify = Tls.PeerVerify(
                  options.getOrDefault("peer-verify", "optional-untrusted")),
                caFile = Option(options.get("ca-file")),
                caDir = Option(options.get("ca-dir")))))
      }
    }
}

object SyslogSocket {
  val schema: StructType = StructType(Seq(
    StructField("record", StringType),      // one framed message, UTF-8
    StructField("peer", StringType),        // remote address
    StructField("ok", BooleanType),         // framing succeeded
    StructField("recv_ts", TimestampType))) // driver receive time

  /** Ephemeral-port discovery for `option("port", "0")`: after the query
    * starts, the actual bound port is published under the `name` option. */
  private[sources] val bound = new ConcurrentHashMap[String, Integer]()
  def boundPort(name: String): Option[Int] = Option(bound.get(name)).map(_.intValue)
}

private final case class SocketOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Driver-side listener + micro-batch buffer. One accept loop (tcp) or one
  * datagram pump (udp); per-connection reader threads append framed rows to
  * `buffer` under its lock. Offsets count rows ever received; `commit`
  * trims the delivered prefix.
  */
private final class SyslogSocketStream(
    port: Int,
    transport: String,
    framing: String,
    maxMsgSize: Int,
    name: Option[String],
    parallelism: Int,
    path: Option[String] = None,
    tls: Option[() => Tls.ServerTls] = None) extends MicroBatchStream {

  // (record, peer, ok, recvMicros)
  private val buffer = new ArrayBuffer[(String, String, Boolean, Long)]()
  private var trimmed = 0L // rows removed from the head of buffer
  private val running = new AtomicBoolean(true)
  private var server: ServerSocket = _
  private var dgram: DatagramSocket = _
  private var unixServer: java.nio.channels.ServerSocketChannel = _

  /** Restart rebase: a checkpointed offset from a previous run can exceed
    * anything this fresh stream has seen (socket bytes are not
    * replayable; the prior run's rows died with its process). Jump the
    * base forward, KEEPING the buffer: everything in it arrived after this
    * restart, so renumbering it past the checkpoint (a) serves the
    * re-executed restart batch as empty instead of MISLABELING fresh rows
    * under old offsets, and (b) preserves every fresh row instead of
    * letting the checkpoint's commit trim it. Pre-restart rows are lost —
    * the documented at-most-once contract of tcp() without disk-buffer.
    */
  private def rebaseTo(n: Long): Unit = buffer.synchronized {
    if (n > trimmed + buffer.size) trimmed = n // buffer rows → offsets [n, n+size)
  }

  locally {
    transport match {
      case "udp" =>
        dgram = new DatagramSocket(new InetSocketAddress(port))
        name.foreach(n => SyslogSocket.bound.put(n, dgram.getLocalPort))
        spawn("graft-udp-listener") {
          val buf = new Array[Byte](math.min(maxMsgSize, 65535))
          while (running.get()) {
            val pkt = new DatagramPacket(buf, buf.length)
            try {
              dgram.receive(pkt)
              val rec = new String(pkt.getData, pkt.getOffset, pkt.getLength, "UTF-8")
              append(rec, pkt.getAddress.getHostAddress, ok = true)
            } catch { case _: java.net.SocketException => () } // closed
          }
        }
      case "unix-stream" =>
        // reference afunix-source.c unix-stream(): AF_UNIX stream server
        // (JDK 17 JEP 380; unix-dgram has no JDK datagram support)
        val p = path.getOrElse(sys.error("syslog-socket: unix-stream needs option(\"path\")"))
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
        unixServer = java.nio.channels.ServerSocketChannel
          .open(java.net.StandardProtocolFamily.UNIX)
        unixServer.bind(java.net.UnixDomainSocketAddress.of(p))
        name.foreach(n => SyslogSocket.bound.put(n, 0)) // readiness signal
        spawn("graft-unix-accept") {
          while (running.get()) {
            try {
              val ch = unixServer.accept()
              spawn("graft-unix-conn") {
                val in = new BufferedInputStream(
                  java.nio.channels.Channels.newInputStream(ch))
                try readStream(in, "unix")
                catch { case _: java.io.IOException => () }
                finally ch.close()
              }
            } catch { case _: java.nio.channels.ClosedChannelException => () }
          }
        }
      case t =>
        // tcp, or tls when an SSLContext factory is configured (reference
        // transport(tls), RFC5425 syslog-over-TLS: same framing, the
        // SSLServerSocket handshakes per connection and hands back a
        // plain-looking stream — readConnection is transport-agnostic)
        server =
          if (t == "tls")
            tls.getOrElse(sys.error("syslog-socket: transport(tls) needs " +
              "key-file()+cert-file() or keystore()+keystore-password"))()
              .createServerSocket(port)
          else new ServerSocket(port)
        name.foreach(n => SyslogSocket.bound.put(n, server.getLocalPort))
        spawn("graft-tcp-accept") {
          while (running.get()) {
            try {
              val sock = server.accept()
              spawn(s"graft-tcp-conn-${sock.getPort}")(readConnection(sock))
            } catch {
              case _: java.net.SocketException => () // closed
              case _: javax.net.ssl.SSLException => () // failed handshake
            }
          }
        }
    }
  }

  private def spawn(tname: String)(body: => Unit): Unit = {
    val t = new Thread(() => body, tname)
    t.setDaemon(true) // lifecycle rides the sockets + `running`, no joins
    t.start()
  }

  private def append(rec: String, peer: String, ok: Boolean): Unit =
    buffer.synchronized {
      buffer += ((rec, peer, ok, System.currentTimeMillis() * 1000L))
    }

  /** One connection: auto-detect framing on the first byte (digit ⇒ octet
    * counted, reference logproto-auto-server.c), then frame until EOF. */
  private def readConnection(sock: Socket): Unit = {
    val peer = sock.getInetAddress.getHostAddress
    val in = new BufferedInputStream(sock.getInputStream)
    try readStream(in, peer)
    catch {
      case _: java.io.IOException => () // peer went away; keep what we framed
    } finally sock.close()
  }

  /** Shared framing entry for stream transports (tcp, unix-stream). */
  private def readStream(in: BufferedInputStream, peer: String): Unit = {
    val mode = framing match {
      case "auto" =>
        in.mark(1)
        val first = in.read()
        if (first < 0) return
        in.reset()
        if (first >= '0' && first <= '9') "octet-counted" else "non-transparent"
      case m => m
    }
    if (mode == "octet-counted") readOctetCounted(in, peer)
    else readDelimited(in, peer)
  }

  /** RFC6587: `<len> SP <len bytes>` repeated. Malformed header ⇒ one
    * ok=false row with the offending prefix, then close (the framed
    * server's error path, logproto-framed-server.c:162). */
  private def readOctetCounted(in: InputStream, peer: String): Unit = {
    while (true) {
      var len = 0L
      var digits = 0
      var c = in.read()
      if (c < 0) return // clean EOF between frames
      val headBytes = new StringBuilder
      while (c >= '0' && c <= '9' && digits < 10) {
        headBytes.append(c.toChar); len = len * 10 + (c - '0'); digits += 1; c = in.read()
      }
      if (c != ' ' || digits == 0 || len > maxMsgSize) {
        if (c >= 0) headBytes.append(c.toChar)
        append(headBytes.result(), peer, ok = false)
        return
      }
      val body = new Array[Byte](len.toInt)
      var off = 0
      while (off < len) {
        val n = in.read(body, off, len.toInt - off)
        if (n < 0) { // truncated final frame
          append(new String(body, 0, off, "UTF-8"), peer, ok = false)
          return
        }
        off += n
      }
      append(new String(body, "UTF-8"), peer, ok = true)
    }
  }

  /** Non-transparent: newline- or NUL-terminated records; empty records
    * are skipped, a final unterminated record is still delivered
    * (logproto-text-server flushes partial on EOF). Only a \r directly
    * before the terminator is stripped — embedded CRs are message bytes. */
  private def readDelimited(in: InputStream, peer: String): Unit = {
    val cur = new java.lang.StringBuilder
    def flush(ok: Boolean): Unit = {
      if (cur.length > 0 && cur.charAt(cur.length - 1) == '\r')
        cur.setLength(cur.length - 1)
      if (cur.length > 0) append(cur.toString, peer, ok)
      cur.setLength(0)
    }
    var c = in.read()
    while (c >= 0) {
      if (c == '\n' || c == 0) flush(ok = true)
      else cur.append(c.toChar)
      c = in.read()
      if (cur.length() > maxMsgSize) { flush(ok = false); return }
    }
    flush(ok = true)
  }

  // ---- MicroBatchStream ----

  override def initialOffset(): Offset = SocketOffset(0L)
  override def latestOffset(): Offset =
    buffer.synchronized(SocketOffset(trimmed + buffer.size))
  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    rebaseTo(n) // checkpoint offsets arrive here first on restart
    SocketOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SocketOffset].n, end.asInstanceOf[SocketOffset].n)
    rebaseTo(e)
    val rows = buffer.synchronized {
      buffer.slice(math.max(0, s - trimmed).toInt, math.max(0, e - trimmed).toInt).toArray
    }
    if (rows.isEmpty) Array.empty
    else {
      val chunks = math.min(parallelism, rows.length)
      val per = (rows.length + chunks - 1) / chunks
      rows.grouped(per).map(new SocketPartition(_): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[SocketPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val (rec, peer, ok, micros) = rows(i)
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(rec), UTF8String.fromString(peer),
              ok, micros))
          }
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = buffer.synchronized {
    val e = end.asInstanceOf[SocketOffset].n
    val drop = math.min(math.max(0, e - trimmed), buffer.size.toLong).toInt
    if (drop > 0) buffer.dropInPlace(drop)
    trimmed = math.max(trimmed, e)
  }

  override def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
    if (dgram != null) dgram.close()
    if (unixServer != null) {
      unixServer.close()
      path.foreach(p => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)))
    }
    name.foreach(SyslogSocket.bound.remove(_))
  }
}

private final class SocketPartition(
    val rows: Array[(String, String, Boolean, Long)]) extends InputPartition
