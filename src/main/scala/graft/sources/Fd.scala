package graft.sources

import java.io.{FileInputStream, InputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-descriptor sources — the reference's `stdin()` and `pipe()` drivers
  * (reference `modules/affile/affile-source.c` stdin factory,
  * `modules/affile/named-pipe.c`). An fd is a single sequential byte
  * stream: there is nothing to parallelize in the READ (the reference
  * likewise dedicates one reader to the fd), so ingestion drains the
  * stream on the driver, frames it with the same [[Framing]] splitters the
  * file/socket paths use, and repartitions so every downstream stage
  * (parse, enrich, route) runs distributed. `stdin()` in the reference is
  * a run-once-and-exit source (no follow), which is exactly a bounded
  * batch read; a *live* named pipe is the streaming case — tail it with
  * [[SyslogSocketProvider]]'s topology instead (a pipe and a socket are the
  * same abstraction: one sequential fd on one host).
  *
  * Scale note: fd sources are inherently single-host, single-stream — the
  * reference cannot parallelize them either. The 100 TB path is many
  * producers writing files (then batch `Framing` with per-file
  * parallelism); this driver exists for protocol completeness.
  */
object Fd {

  /** Read one fd to exhaustion and frame it. `framing` as in the socket
    * source: "non-transparent" (newline/NUL records) or "octet-counted"
    * (RFC6587). Returns (record, record_ok) rows spread over
    * `partitions`. */
  def read(spark: SparkSession, in: InputStream,
      framing: String = "non-transparent",
      partitions: Int = 4,
      maxMsgSize: Int = 8 * 1024 * 1024): DataFrame = {
    val bytes = in.readAllBytes()
    val framed = framing match {
      case "octet-counted" => Framing.octetCountedFrames(bytes, maxMsgSize)
      case _ =>
        new String(bytes, "UTF-8").split("[\n\u0000]").toSeq
          // CR strip precedes the empty-record drop so a lone "\r" line is
          // dropped, matching the socket path (SyslogSocket.readDelimited)
          .map(_.stripSuffix("\r"))
          .filter(_.nonEmpty)
          .map(r => (r, r.length <= maxMsgSize)) // oversize flagged, like the socket path
    }
    import spark.implicits._
    framed.toDF("record", "record_ok").repartition(partitions)
  }

  /** stdin() — the process's own standard input. */
  def stdin(spark: SparkSession, framing: String = "non-transparent"): DataFrame =
    read(spark, System.in, framing)

  /** pipe(path) — a named pipe (fifo). Opening a fifo blocks until a
    * writer connects, matching the reference's open-on-start. */
  def pipe(spark: SparkSession, path: String,
      framing: String = "non-transparent"): DataFrame = {
    val in = new FileInputStream(path)
    try read(spark, in, framing) finally in.close()
  }
}
