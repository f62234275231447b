package graft

import java.io.ByteArrayInputStream
import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}

import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{Fd, SyslogSocket}

/** Live socket sources (reference network()/syslog()/tcp()/udp()) and fd
  * sources (stdin()/pipe()): framing fidelity over real sockets through the
  * DataSource V2 micro-batch path. */
class SocketSourceSpec extends SparkSpec {

  private def startQuery(table: String, name: String, options: Map[String, String])
      : (StreamingQuery, Int) = {
    var reader = spark.readStream.format("syslog-socket")
      .option("port", "0").option("name", name)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load().writeStream.format("memory")
      .queryName(table).outputMode("append").start()
    val deadline = System.currentTimeMillis() + 15000
    var port: Option[Int] = None
    while (port.isEmpty && System.currentTimeMillis() < deadline) {
      port = SyslogSocket.boundPort(name)
      if (port.isEmpty) Thread.sleep(50)
    }
    assert(port.isDefined, "listener did not bind")
    (q, port.get)
  }

  private def awaitRows(q: StreamingQuery, table: String, n: Long): Unit = {
    val deadline = System.currentTimeMillis() + 20000
    while (spark.table(table).count() < n && System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      Thread.sleep(100)
    }
    assert(spark.table(table).count() >= n, s"expected $n rows in $table")
  }

  test("tcp octet-counted: RFC6587 frames become rows; malformed header flagged") {
    val (q, port) = startQuery("sock_oc", "t_oc", Map("framing" -> "octet-counted"))
    try {
      val s = new Socket("127.0.0.1", port)
      s.getOutputStream.write("5 hello6 world!".getBytes("UTF-8"))
      s.getOutputStream.flush(); s.close()
      // second connection: garbage header → ok=false, connection dropped
      val s2 = new Socket("127.0.0.1", port)
      s2.getOutputStream.write("xx nope".getBytes("UTF-8"))
      s2.getOutputStream.flush(); s2.close()
      awaitRows(q, "sock_oc", 3)
      val rows = spark.table("sock_oc").select("record", "ok")
        .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
      assert(rows.contains(("hello", true)))
      assert(rows.contains(("world!", true)))
      assert(rows.exists { case (rec, ok) => !ok && rec.startsWith("x") })
    } finally q.stop()
  }

  test("tcp auto framing: digit first byte = octet-counted, else newline records") {
    val (q, port) = startQuery("sock_auto", "t_auto", Map.empty)
    try {
      val a = new Socket("127.0.0.1", port)
      a.getOutputStream.write("<13>t1 host app: msg one\n<13>t2 host app: msg two\n".getBytes)
      a.getOutputStream.flush(); a.close()
      val b = new Socket("127.0.0.1", port)
      b.getOutputStream.write("3 foo".getBytes)
      b.getOutputStream.flush(); b.close()
      awaitRows(q, "sock_auto", 3)
      val recs = spark.table("sock_auto").select("record").collect().map(_.getString(0)).toSet
      assert(recs === Set("<13>t1 host app: msg one", "<13>t2 host app: msg two", "foo"))
      assert(spark.table("sock_auto").filter("NOT ok").count() === 0)
    } finally q.stop()
  }

  test("udp: one datagram, one message (dgram framing)") {
    val (q, port) = startQuery("sock_udp", "t_udp", Map("transport" -> "udp"))
    try {
      val sock = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      Seq("alpha", "beta gamma").foreach { m =>
        val b = m.getBytes("UTF-8")
        sock.send(new DatagramPacket(b, b.length, addr, port))
      }
      sock.close()
      awaitRows(q, "sock_udp", 2)
      val recs = spark.table("sock_udp").select("record").collect().map(_.getString(0)).toSet
      assert(recs === Set("alpha", "beta gamma"))
    } finally q.stop()
  }

  test("end-to-end: live syslog over tcp through the grok parse stage") {
    val parsed = graft.parsers.GrokStage(
      spark.readStream.format("syslog-socket")
        .option("port", "0").option("name", "t_e2e").load(),
      "record", graft.parsers.GrokStage.transcriptRules)
    val q = parsed.writeStream.format("memory")
      .queryName("sock_parsed").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (graft.sources.SyslogSocket.boundPort("t_e2e").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val p2 = graft.sources.SyslogSocket.boundPort("t_e2e").get
      val s = new Socket("127.0.0.1", p2)
      s.getOutputStream.write(
        ("<13>Jan  2 03:04:05 web01 sshd[42]: action=login status=ok\n" +
          "event=call tool=grep duration_ms=12 ok=true\n" +
          "not a recognized line\n").getBytes("UTF-8"))
      s.getOutputStream.flush(); s.close()
      awaitRows(q, "sock_parsed", 3)
      val rows = spark.table("sock_parsed")
        .selectExpr("rule_id", "try_element_at(fields, 'host')",
          "try_element_at(fields, 'tool')").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows === Set(
        ("syslog", "web01", null), ("kv", null, "grep"), (null, null, null)))
    } finally q.stop()
  }

  test("tls transport: RFC5425 syslog-over-TLS via keystore AND reference-style PEM files") {
    // self-signed server identity, generated with the JDK's own keytool
    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val ksPath = s"$dir/server.p12"
    val keytool = new java.io.File(sys.props("java.home"), "bin/keytool").getAbsolutePath
    val rc = new ProcessBuilder(keytool, "-genkeypair", "-alias", "srv",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "30",
      "-dname", "CN=localhost", "-keystore", ksPath, "-storetype", "PKCS12",
      "-storepass", "changeit", "-keypass", "changeit")
      .redirectErrorStream(true).start().waitFor()
    assert(rc === 0, "keytool failed")
    // export the reference-style PEMs (unencrypted PKCS#8 key + X.509 cert)
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fin = new java.io.FileInputStream(ksPath)
    try ks.load(fin, "changeit".toCharArray) finally fin.close()
    val keyPem = s"$dir/server.key"; val certPem = s"$dir/server.crt"
    graft.sources.Tls.writePem(keyPem, "PRIVATE KEY",
      ks.getKey("srv", "changeit".toCharArray).getEncoded)
    graft.sources.Tls.writePem(certPem, "CERTIFICATE",
      ks.getCertificate("srv").getEncoded)

    def sendTls(port: Int, payload: String): Unit = {
      val s = graft.sources.Tls.clientContext(certPem).getSocketFactory
        .createSocket("127.0.0.1", port)
      s.getOutputStream.write(payload.getBytes("UTF-8"))
      s.getOutputStream.flush(); s.close()
    }

    // 1. keystore() form
    val (q1, p1) = startQuery("sock_tls_ks", "t_tls_ks", Map(
      "transport" -> "tls", "keystore" -> ksPath, "keystore-password" -> "changeit"))
    try {
      sendTls(p1, "<13>t1 host app: over tls\n")
      sendTls(p1, "5 hello") // auto framing works through TLS too
      awaitRows(q1, "sock_tls_ks", 2)
      val recs = spark.table("sock_tls_ks").select("record")
        .collect().map(_.getString(0)).toSet
      assert(recs === Set("<13>t1 host app: over tls", "hello"))
    } finally q1.stop()

    // 2. key-file()/cert-file() PEM form (the reference's tls() options)
    val (q2, p2) = startQuery("sock_tls_pem", "t_tls_pem", Map(
      "transport" -> "tls", "key-file" -> keyPem, "cert-file" -> certPem))
    try {
      sendTls(p2, "<14>t2 host app: pem identity\n")
      awaitRows(q2, "sock_tls_pem", 1)
      assert(spark.table("sock_tls_pem").select("record").head().getString(0)
        === "<14>t2 host app: pem identity")
      // a PLAINTEXT client on the TLS port never becomes a row
      val plain = new Socket("127.0.0.1", p2)
      plain.getOutputStream.write("not tls\n".getBytes); plain.getOutputStream.flush()
      plain.close()
      q2.processAllAvailable()
      assert(spark.table("sock_tls_pem").count() === 1)
    } finally q2.stop()
  }

  test("tls peer-verify: mutual TLS accepts CA-signed clients, rejects bare/rogue ones; encrypted key-file loads") {
    // fixtures via the JDK's keytool: a CA (bc:c so PKIX accepts it as an
    // anchor), a client identity SIGNED by that CA, and a rogue self-signed
    // client from outside the CA
    val dir = java.nio.file.Files.createTempDirectory("graft-mtls")
    val keytool = new java.io.File(sys.props("java.home"), "bin/keytool").getAbsolutePath
    def kt(args: String*): Unit = {
      val rc = new ProcessBuilder((keytool +: args): _*)
        .redirectErrorStream(true).start().waitFor()
      assert(rc === 0, s"keytool ${args.head} failed")
    }
    def genPair(ks: String, alias: String, dname: String, ext: Seq[String] = Nil): Unit =
      kt(Seq("-genkeypair", "-alias", alias, "-keyalg", "RSA", "-keysize", "2048",
        "-validity", "30", "-dname", dname, "-keystore", ks, "-storetype", "PKCS12",
        "-storepass", "changeit", "-keypass", "changeit") ++ ext: _*)
    val caKs = s"$dir/ca.p12"; val cliKs = s"$dir/cli.p12"
    val srvKs = s"$dir/srv.p12"; val rogueKs = s"$dir/rogue.p12"
    genPair(caKs, "ca", "CN=graft-ca", Seq("-ext", "bc:c"))
    genPair(cliKs, "cli", "CN=graft-client")
    genPair(srvKs, "srv", "CN=localhost")
    genPair(rogueKs, "rogue", "CN=graft-rogue")
    // sign the client with the CA: csr -> gencert
    kt("-certreq", "-alias", "cli", "-keystore", cliKs, "-storepass", "changeit",
      "-file", s"$dir/cli.csr")
    kt("-gencert", "-alias", "ca", "-keystore", caKs, "-storepass", "changeit",
      "-infile", s"$dir/cli.csr", "-outfile", s"$dir/cli.cer", "-rfc", "-validity", "30")
    def load(path: String) = {
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(path)
      try ks.load(in, "changeit".toCharArray) finally in.close()
      ks
    }
    def keyOf(ks: java.security.KeyStore, alias: String) =
      ks.getKey(alias, "changeit".toCharArray).asInstanceOf[java.security.PrivateKey]
    import graft.sources.Tls
    val caPem = s"$dir/ca.pem"
    Tls.writePem(caPem, "CERTIFICATE", load(caKs).getCertificate("ca").getEncoded)
    // client PEM identity: key + chain [CA-signed leaf, CA]
    val cliKey = s"$dir/cli.key"
    Tls.writePem(cliKey, "PRIVATE KEY", keyOf(load(cliKs), "cli").getEncoded)
    val cliChain = s"$dir/cli-chain.pem"
    java.nio.file.Files.write(java.nio.file.Paths.get(cliChain),
      (new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/cli.cer")), "US-ASCII") +
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(caPem)), "US-ASCII")).getBytes("US-ASCII"))
    // rogue PEM identity (self-signed, not from the CA)
    val rogueKey = s"$dir/rogue.key"; val rogueCert = s"$dir/rogue.pem"
    Tls.writePem(rogueKey, "PRIVATE KEY", keyOf(load(rogueKs), "rogue").getEncoded)
    Tls.writePem(rogueCert, "CERTIFICATE", load(rogueKs).getCertificate("rogue").getEncoded)
    // server PEM identity: ENCRYPTED key (key-password() path) + self-signed cert
    val srvKey = s"$dir/srv.key"; val srvCert = s"$dir/srv.pem"
    Tls.writeEncryptedKeyPem(srvKey, keyOf(load(srvKs), "srv"), "s3cret")
    Tls.writePem(srvCert, "CERTIFICATE", load(srvKs).getCertificate("srv").getEncoded)

    // the encrypted PEM round-trips in-JVM, and demands its password
    assert(Tls.loadPrivateKey(srvKey, Some("s3cret")).getAlgorithm === "RSA")
    assertThrows[RuntimeException](Tls.loadPrivateKey(srvKey, None))
    // interop: openssl's default PBES2 (AES-CBC + HMAC-SHA256) PKCS#8
    // encryption also loads — skipped when no openssl binary is around
    val plainSrvKey = s"$dir/srv-plain.key"
    Tls.writePem(plainSrvKey, "PRIVATE KEY", keyOf(load(srvKs), "srv").getEncoded)
    val osslOk = try {
      new ProcessBuilder("openssl", "pkcs8", "-topk8", "-in", plainSrvKey,
        "-out", s"$dir/srv-pbes2.key", "-passout", "pass:s3cret")
        .redirectErrorStream(true).start().waitFor() == 0
    } catch { case _: java.io.IOException => false }
    if (osslOk)
      assert(Tls.loadPrivateKey(s"$dir/srv-pbes2.key", Some("s3cret"))
        .getAlgorithm === "RSA")

    def send(port: Int, ctx: javax.net.ssl.SSLContext, payload: String): Boolean =
      try {
        val s = ctx.getSocketFactory.createSocket("127.0.0.1", port)
        s.getOutputStream.write(payload.getBytes("UTF-8"))
        s.getOutputStream.flush(); s.close(); true
      } catch { case _: java.io.IOException => false }

    // 1. required-trusted: only the CA-signed client produces rows
    val (q1, p1) = startQuery("sock_mtls", "t_mtls", Map(
      "transport" -> "tls", "key-file" -> srvKey, "key-password" -> "s3cret",
      "cert-file" -> srvCert, "peer-verify" -> "required-trusted",
      "ca-file" -> caPem))
    try {
      send(p1, Tls.clientContext(srvCert), "<13>bare no client cert\n") // rejected
      send(p1, Tls.clientContext(srvCert, Some(rogueKey), Some(rogueCert)),
        "<13>rogue ca\n") // rejected: not signed by the CA
      send(p1, Tls.clientContext(srvCert, Some(cliKey), Some(cliChain)),
        "<13>mutual tls ok\n") // accepted
      awaitRows(q1, "sock_mtls", 1)
      Thread.sleep(300); q1.processAllAvailable()
      val recs = spark.table("sock_mtls").select("record")
        .collect().map(_.getString(0)).toSet
      assert(recs === Set("<13>mutual tls ok"))
    } finally q1.stop()

    // 2. required-untrusted: a cert must be PRESENTED but any issuer passes
    val (q2, p2) = startQuery("sock_mtls_u", "t_mtls_u", Map(
      "transport" -> "tls", "key-file" -> srvKey, "key-password" -> "s3cret",
      "cert-file" -> srvCert, "peer-verify" -> "required-untrusted"))
    try {
      send(p2, Tls.clientContext(srvCert, Some(rogueKey), Some(rogueCert)),
        "<13>untrusted but presented\n") // accepted
      awaitRows(q2, "sock_mtls_u", 1)
      assert(spark.table("sock_mtls_u").select("record").head().getString(0)
        === "<13>untrusted but presented")
    } finally q2.stop()

    // 3. ca-dir() form: trust anchors loaded from a directory
    val caDir = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$dir/cadir")).toString
    java.nio.file.Files.copy(java.nio.file.Paths.get(caPem),
      java.nio.file.Paths.get(s"$caDir/graft-ca.pem"))
    val (q3, p3) = startQuery("sock_mtls_d", "t_mtls_d", Map(
      "transport" -> "tls", "key-file" -> srvKey, "key-password" -> "s3cret",
      "cert-file" -> srvCert, "peer-verify" -> "required-trusted",
      "ca-dir" -> caDir))
    try {
      send(p3, Tls.clientContext(srvCert, Some(cliKey), Some(cliChain)),
        "<13>ca-dir trust\n")
      awaitRows(q3, "sock_mtls_d", 1)
      assert(spark.table("sock_mtls_d").select("record").head().getString(0)
        === "<13>ca-dir trust")
    } finally q3.stop()
  }

  test("fd source: newline and octet-counted framing from a byte stream") {
    val nl = Fd.read(spark,
      new ByteArrayInputStream("one\r\ntwo\n\nthree".getBytes("UTF-8")))
    assert(nl.select("record").collect().map(_.getString(0)).toSet
      === Set("one", "two", "three"))
    val oc = Fd.read(spark,
      new ByteArrayInputStream("3 abc4 defg".getBytes("UTF-8")),
      framing = "octet-counted")
    assert(oc.filter("record_ok").select("record").collect().map(_.getString(0)).toSet
      === Set("abc", "defg"))
    assert(nl.rdd.getNumPartitions === 4) // downstream stages parallelize
    // oversize record flagged, like the socket path
    val big = Fd.read(spark,
      new ByteArrayInputStream("ok\nxxxxxxxxxx\n".getBytes("UTF-8")), maxMsgSize = 5)
    assert(big.collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
      === Set(("ok", true), ("xxxxxxxxxx", false)))
  }

  test("embedded CR is message content; only CR before the terminator is stripped") {
    val (q, port) = startQuery("sock_cr", "t_cr", Map("framing" -> "non-transparent"))
    try {
      val s = new Socket("127.0.0.1", port)
      s.getOutputStream.write("abc\rdef\r\nplain\n".getBytes("UTF-8"))
      s.getOutputStream.flush(); s.close()
      awaitRows(q, "sock_cr", 2)
      assert(spark.table("sock_cr").select("record").collect().map(_.getString(0)).toSet
        === Set("abc\rdef", "plain"))
    } finally q.stop()
  }

  test("unix-stream: AF_UNIX stream socket with auto framing") {
    val sockPath = java.nio.file.Files.createTempDirectory("graftunix")
      .resolve("s.sock").toString
    var reader = spark.readStream.format("syslog-socket")
      .option("transport", "unix-stream").option("path", sockPath)
      .option("name", "t_unix")
    val q = reader.load().writeStream.format("memory")
      .queryName("sock_unix").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (SyslogSocket.boundPort("t_unix").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(SyslogSocket.boundPort("t_unix").isDefined, "unix listener did not bind")
      val ch = java.nio.channels.SocketChannel.open(
        java.net.UnixDomainSocketAddress.of(sockPath))
      ch.write(java.nio.ByteBuffer.wrap(
        "<13>t1 host app: via unix\n6 framed".getBytes("UTF-8")))
      ch.close()
      awaitRows(q, "sock_unix", 2)
      val rows = spark.table("sock_unix").select("record", "peer")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // one connection picks ONE framing mode (auto on first byte): the
      // newline record arrives first so the rest rides non-transparent
      assert(rows === Set(
        ("<13>t1 host app: via unix", "unix"), ("6 framed", "unix")))
    } finally q.stop()
  }

  test("restart from a checkpoint: fresh rows survive under rebased offsets") {
    val ckpt = java.nio.file.Files.createTempDirectory("sockckpt").toString
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def start() = spark.readStream.format("syslog-socket")
      .option("port", "0").option("name", "t_restart").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("record").collect().foreach(r => received.add(r.getString(0))); ()
      }.start()
    def port(): Int = {
      val deadline = System.currentTimeMillis() + 15000
      while (SyslogSocket.boundPort("t_restart").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      SyslogSocket.boundPort("t_restart").get
    }
    def send(p: Int, s: String): Unit = {
      val sock = new Socket("127.0.0.1", p)
      sock.getOutputStream.write(s.getBytes("UTF-8"))
      sock.getOutputStream.flush(); sock.close()
    }
    def awaitReceived(q: org.apache.spark.sql.streaming.StreamingQuery, n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 20000
      while (received.size < n && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
    }
    val q1 = start()
    send(port(), "one\ntwo\n")
    awaitReceived(q1, 2)
    q1.stop()
    // restart: checkpointed offsets exceed the fresh stream's buffer; the
    // rebase must not discard or mislabel the post-restart rows
    val q2 = start()
    send(port(), "three\n")
    awaitReceived(q2, 3)
    q2.stop()
    import scala.jdk.CollectionConverters._
    assert(received.asScala.toSet === Set("one", "two", "three"))
  }
}
