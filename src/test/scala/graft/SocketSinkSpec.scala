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
