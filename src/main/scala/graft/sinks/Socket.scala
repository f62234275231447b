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
}
