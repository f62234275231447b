package graft

import java.net.{DatagramPacket, DatagramSocket, ServerSocket}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sinks.Socket

/** Socket destinations (reference afsocket-dest client drivers): writer
  * framing, per-partition connections, udp datagrams, TLS client. */
class SocketSinkSpec extends SparkSpec {
  import spark.implicits._

  private def collectTcp(server: ServerSocket, done: CountDownLatch,
      out: java.lang.StringBuilder): Thread = {
    val t = new Thread(() => {
      try {
        var sock = server.accept()
        while (sock != null) {
          val bytes = sock.getInputStream.readAllBytes()
          out.synchronized { out.append(new String(bytes, "UTF-8")) }
          done.countDown()
          sock = if (done.getCount > 0) server.accept() else null
        }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start(); t
  }

  test("tcp non-transparent and octet-counted writer framing") {
    val server = new ServerSocket(0)
    val done = new CountDownLatch(1)
    val out = new java.lang.StringBuilder
    collectTcp(server, done, out)
    val df = Seq("m one", "m two").toDF("msg").coalesce(1)
    val n = Socket.write(df, "127.0.0.1", server.getLocalPort, col("msg"))
    assert(n === 2)
    assert(done.await(10, TimeUnit.SECONDS))
    assert(out.toString === "m one\nm two\n")

    val done2 = new CountDownLatch(1)
    val out2 = new java.lang.StringBuilder
    val server2 = new ServerSocket(0)
    collectTcp(server2, done2, out2)
    Socket.write(df, "127.0.0.1", server2.getLocalPort, col("msg"),
      framing = "octet-counted")
    assert(done2.await(10, TimeUnit.SECONDS))
    assert(out2.toString === "5 m one5 m two")
    server.close(); server2.close()
  }

  test("udp: one datagram per message") {
    val sock = new DatagramSocket()
    val got = scala.collection.mutable.Set.empty[String]
    val done = new CountDownLatch(2)
    val t = new Thread(() => {
      val buf = new Array[Byte](65535)
      while (done.getCount > 0) {
        val p = new DatagramPacket(buf, buf.length)
        sock.receive(p)
        got.synchronized { got += new String(p.getData, p.getOffset, p.getLength, "UTF-8") }
        done.countDown()
      }
    })
    t.setDaemon(true); t.start()
    val df = Seq("alpha", "beta").toDF("msg").coalesce(1)
    Socket.write(df, "127.0.0.1", sock.getLocalPort, col("msg"), transport = "udp")
    assert(done.await(10, TimeUnit.SECONDS))
    assert(got.toSet === Set("alpha", "beta"))
    sock.close()
  }

  /** Accepts connections in a loop until the server socket closes; each
    * connection's bytes append atomically after its EOF. */
  private def collectLoop(server: ServerSocket, out: java.lang.StringBuilder): Thread = {
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val bytes = s.getInputStream.readAllBytes()
        out.synchronized { out.append(new String(bytes, "UTF-8")) }
        s.close()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start(); t
  }

  test("failover(): dead primary advances to the secondary, nothing lost") {
    val deadPort = { val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val live = new ServerSocket(0)
    val done = new CountDownLatch(1)
    val out = new java.lang.StringBuilder
    collectTcp(live, done, out)
    val df = (0 until 10).map(i => s"f$i").toDF("msg").coalesce(1)
    val (n, used) = Socket.writeFailover(df,
      Seq(("127.0.0.1", deadPort), ("127.0.0.1", live.getLocalPort)),
      col("msg"), batchLines = 4)
    assert(n === 10 && used === 1, "only the secondary ever carried traffic")
    assert(done.await(10, TimeUnit.SECONDS))
    assert(out.toString === (0 until 10).map(i => s"f$i\n").mkString)
    live.close()
  }

  test("failover(): primary killed mid-batch fails over; in-flight batch resent, no loss") {
    // the primary reads 64 KB of a 16 MB batch then hard-closes (RST).
    // The batch cannot fit any socket buffer, so the sender's flush is
    // still in progress when the reset lands -> IOException inside the
    // batch -> reconnect to the secondary and resend the WHOLE batch.
    val primary = new ServerSocket()
    primary.setReceiveBufferSize(8192)
    primary.bind(new java.net.InetSocketAddress("127.0.0.1", 0))
    val killer = new Thread(() => {
      try {
        val s = primary.accept()
        val in = s.getInputStream
        val buf = new Array[Byte](8192)
        var got = 0
        while (got < 65536) { val k = in.read(buf); if (k < 0) got = 65536 else got += k }
        s.setSoLinger(true, 0) // RST, not FIN
        s.close()
      } catch { case _: Exception => () }
    })
    killer.setDaemon(true); killer.start()

    val secondary = new ServerSocket(0)
    val done = new CountDownLatch(1)
    val out = new java.lang.StringBuilder
    collectTcp(secondary, done, out)

    val pad = "x" * 1000
    val rows = (0 until 16000).map(i => s"$pad-$i")
    val df = rows.toDF("msg").coalesce(1)
    val (n, used) = Socket.writeFailover(df,
      Seq(("127.0.0.1", primary.getLocalPort), ("127.0.0.1", secondary.getLocalPort)),
      col("msg"), batchLines = 16000)
    assert(n === 16000 && used === 2)
    assert(done.await(30, TimeUnit.SECONDS))
    // the secondary holds the COMPLETE batch: at-least-once, zero loss
    assert(out.toString === rows.map(_ + "\n").mkString)
    primary.close(); secondary.close()
  }

  test("failover(): failback probes re-admit the primary after N consecutive successes") {
    val a = new ServerSocket(0) // primary (starts 'down' via the connect gate)
    val b = new ServerSocket(0) // secondary
    val outA = new java.lang.StringBuilder
    val outB = new java.lang.StringBuilder
    collectLoop(a, outA); collectLoop(b, outB)

    @volatile var primaryUp = false
    var tick = 0L
    def connectTo(i: Int): java.net.Socket = {
      if (i == 0 && !primaryUp) throw new java.io.IOException("primary down")
      val srv = if (i == 0) a else b
      new java.net.Socket("127.0.0.1", srv.getLocalPort)
    }
    // one row per batch; pulling row 5 brings the primary back up, and the
    // fake clock advances one probe interval per batch
    val rowsIt = (1 to 20).iterator.map { i =>
      tick += 10
      if (i == 5) primaryUp = true
      s"r$i"
    }
    val (n, used) = Socket.sendFailover(rowsIt, 2, connectTo(_),
      framing = "non-transparent", batchLines = 1, connectRetries = 3,
      failback = true, probeIntervalMs = 10, probesRequired = 2,
      clock = () => tick)
    assert(n === 20 && used === 2)
    Thread.sleep(300) // collectors drain after the close
    // probes at batches 5 and 6 succeed -> batch 6 onward goes primary
    assert(outB.toString === (1 to 5).map(i => s"r$i\n").mkString,
      "secondary carried traffic only until the failback")
    assert(outA.toString === (6 to 20).map(i => s"r$i\n").mkString,
      "primary resumed from the batch after probesRequired successes")
    a.close(); b.close()
  }

  test("tls client: frames arrive over an RFC5425 handshake; loops back into our TLS source") {
    // server identity via keytool, exported cert as the client's ca-file
    val dir = java.nio.file.Files.createTempDirectory("graft-tlssink")
    val ksPath = s"$dir/server.p12"
    val keytool = new java.io.File(sys.props("java.home"), "bin/keytool").getAbsolutePath
    assert(new ProcessBuilder(keytool, "-genkeypair", "-alias", "srv",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
      "-dname", "CN=localhost", "-keystore", ksPath, "-storetype", "PKCS12",
      "-storepass", "changeit", "-keypass", "changeit")
      .redirectErrorStream(true).start().waitFor() === 0)
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fin = new java.io.FileInputStream(ksPath)
    try ks.load(fin, "changeit".toCharArray) finally fin.close()
    val certPem = s"$dir/server.crt"
    graft.sources.Tls.writePem(certPem, "CERTIFICATE",
      ks.getCertificate("srv").getEncoded)

    // the receiving end is OUR tls source: sink → source loopback
    val q = spark.readStream.format("syslog-socket")
      .option("port", "0").option("name", "t_tls_sink")
      .option("transport", "tls")
      .option("keystore", ksPath).option("keystore-password", "changeit")
      .load().writeStream.format("memory").queryName("tls_loop")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      var port: Option[Int] = None
      while (port.isEmpty && System.currentTimeMillis() < deadline) {
        port = graft.sources.SyslogSocket.boundPort("t_tls_sink")
        if (port.isEmpty) Thread.sleep(50)
      }
      val df = Seq("<13>h app: secure one", "<13>h app: secure two").toDF("msg")
        .coalesce(1)
      val n = Socket.write(df, "127.0.0.1", port.get, col("msg"),
        transport = "tls", framing = "octet-counted", caFile = Some(certPem))
      assert(n === 2)
      val t1 = System.currentTimeMillis() + 20000
      while (spark.table("tls_loop").count() < 2 && System.currentTimeMillis() < t1) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val recs = spark.table("tls_loop").select("record")
        .collect().map(_.getString(0)).toSet
      assert(recs === Set("<13>h app: secure one", "<13>h app: secure two"))
    } finally q.stop()
  }
}
