package graft

import java.net.InetSocketAddress
import java.util.Collections
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.sinks.Http

/** http() destination: codegen-rendered bodies, batch-lines batching, and
  * the reference's status→worker-status mapping (drop set vs per-message
  * ERROR retries vs NOT_CONNECTED reconnect; modules/http/http-worker.c:395). */
class HttpSinkSpec extends SparkSpec {

  private def withServer(test: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.start()
    try test(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  test("batch-lines: bodies are delimiter-joined batches, all rows delivered") {
    withServer { (server, port) =>
      val bodies = Collections.synchronizedList(new java.util.ArrayList[String]())
      server.createContext("/ingest", (ex: HttpExchange) => {
        bodies.add(body(ex)); ex.sendResponseHeaders(200, -1); ex.close()
      })
      val df = spark.range(10).selectExpr("concat('m', id) AS msg").coalesce(1)
      val (delivered, dropped) = Http.write(df, s"http://127.0.0.1:$port/ingest",
        col("msg"), batchLines = 4)
      assert(delivered === 10 && dropped === 0)
      val got = bodies.toArray(Array.empty[String])
      assert(got.length === 3) // 4 + 4 + 2
      assert(got.flatMap(_.split("\n")).sorted.toSeq
        === (0 until 10).map(i => s"m$i").sorted)
    }
  }

  test("5xx is retried until success; the reference drop set drops outright") {
    withServer { (server, port) =>
      val calls = new AtomicInteger(0)
      server.createContext("/flaky", (ex: HttpExchange) => {
        body(ex)
        if (calls.incrementAndGet() == 1) ex.sendResponseHeaders(503, -1)
        else ex.sendResponseHeaders(200, -1)
        ex.close()
      })
      // 410 Gone is in the reference's LTR_DROP set (http-worker.c:368)
      val goneCalls = new AtomicInteger(0)
      server.createContext("/gone", (ex: HttpExchange) => {
        body(ex); goneCalls.incrementAndGet()
        ex.sendResponseHeaders(410, -1); ex.close()
      })
      val df = spark.range(3).selectExpr("concat('r', id) AS msg").coalesce(1)
      val (d1, _) = Http.write(df, s"http://127.0.0.1:$port/flaky", col("msg"),
        batchLines = 3)
      assert(d1 === 3 && calls.get() === 2) // one 503 + one success
      val (d2, drop2) = Http.write(df, s"http://127.0.0.1:$port/gone", col("msg"))
      assert(d2 === 0 && drop2 === 3)
      assert(goneCalls.get() === 3) // one attempt per batch, zero retries
    }
  }

  test("LTR_ERROR statuses (428) retry on the message budget then drop; " +
      "null bodies count as dropped") {
    withServer { (server, port) =>
      val calls = new AtomicInteger(0)
      server.createContext("/precondition", (ex: HttpExchange) => {
        body(ex); calls.incrementAndGet()
        ex.sendResponseHeaders(428, -1); ex.close()
      })
      val df = spark.range(4)
        .selectExpr("CASE WHEN id < 2 THEN concat('m', id) END AS msg").coalesce(1)
      // 2 null bodies dropped up front; the 2 rendered rows form one batch
      // that is retried `retries` times then dropped (not a task failure)
      val (d, drop) = Http.write(df, s"http://127.0.0.1:$port/precondition",
        col("msg"), batchLines = 2, retries = 2)
      assert(d === 0 && drop === 4)
      assert(calls.get() === 3) // initial attempt + 2 retries
    }
  }

  test("plain 4xx (404) maps to NOT_CONNECTED: bounded retries then task failure") {
    withServer { (server, port) =>
      server.createContext("/missing", (ex: HttpExchange) => {
        body(ex); ex.sendResponseHeaders(404, -1); ex.close()
      })
      val df = spark.range(2).selectExpr("cast(id AS string) AS msg").coalesce(1)
      intercept[org.apache.spark.SparkException] {
        Http.write(df, s"http://127.0.0.1:$port/missing", col("msg"), retries = 1)
      }
    }
  }

  test("load balancer: even client spread, failover, timed LRU recovery probe") {
    var now = 0L
    val lb = new Http.LoadBalancer(Seq("a", "b", "c"), 100, () => now)
    val Seq(c1, c2, c3) = Seq.fill(3)(lb.registerClient())
    // 3 clients over 3 operational targets: one each
    val pinned = Seq(c1, c2, c3).map(lb.choose(_).url)
    assert(pinned.toSet === Set("a", "b", "c"))

    // c1's target fails: c1 moves to an operational target; the failed one
    // leaves the rotation
    val t1 = lb.choose(c1)
    lb.fail(t1)
    now = 50
    val moved = lb.choose(c1)
    assert(moved.url !== t1.url)
    assert(lb.failedUrls === Seq(t1.url))

    // after recoveryTimeout the next choose is a probe at the LRU failed
    // target; a success re-admits it
    now = 150
    val probe = lb.choose(c1)
    assert(probe.url === t1.url, "recovery probe routes to the failed target")
    lb.success(probe)
    assert(lb.failedUrls === Seq.empty)
  }

  test("multi-url: rows spread across two live targets") {
    withServer { (server, port) =>
      val a = new AtomicInteger(0)
      val b = new AtomicInteger(0)
      server.createContext("/a", (ex: HttpExchange) => {
        body(ex); a.incrementAndGet(); ex.sendResponseHeaders(200, -1); ex.close()
      })
      server.createContext("/b", (ex: HttpExchange) => {
        body(ex); b.incrementAndGet(); ex.sendResponseHeaders(200, -1); ex.close()
      })
      val df = spark.range(20).selectExpr("concat('m', id) AS msg").repartition(2)
      val (d, drop) = Http.writeBalanced(df,
        Seq(s"http://127.0.0.1:$port/a", s"http://127.0.0.1:$port/b"), col("msg"))
      assert(d === 20 && drop === 0)
      assert(a.get() > 0 && b.get() > 0, "both targets serve traffic")
      assert(a.get() + b.get() === 20)
    }
  }

  test("multi-url: dead target fails over to the survivor without task failure; " +
      "recovery probe re-admits it") {
    withServer { (server, port) =>
      val aUp = new java.util.concurrent.atomic.AtomicBoolean(false)
      val aOk = new AtomicInteger(0)
      val bOk = new AtomicInteger(0)
      server.createContext("/a", (ex: HttpExchange) => {
        body(ex)
        if (aUp.get()) { aOk.incrementAndGet(); ex.sendResponseHeaders(200, -1) }
        else ex.sendResponseHeaders(500, -1)
        ex.close()
      })
      server.createContext("/b", (ex: HttpExchange) => {
        body(ex); bOk.incrementAndGet(); ex.sendResponseHeaders(200, -1); ex.close()
      })
      val urls = Seq(s"http://127.0.0.1:$port/a", s"http://127.0.0.1:$port/b")
      val df = spark.range(8).selectExpr("concat('m', id) AS msg").coalesce(1)

      // phase 1: target a is down — the walk marks it failed, every row
      // lands on b, the task does NOT fail
      val (d1, drop1) = Http.writeBalanced(df, urls, col("msg"),
        recoveryTimeoutMs = 150L)
      assert(d1 === 8 && drop1 === 0)
      assert(bOk.get() === 8 && aOk.get() === 0)
      assert(Http.LoadBalancer.forTargets(urls.toList, 150L).failedUrls
        === Seq(urls.head))

      // phase 2: a comes back; after the recovery window a probe routes a
      // real batch to it and a success re-admits it to the rotation
      aUp.set(true)
      Thread.sleep(200L)
      val (d2, drop2) = Http.writeBalanced(df, urls, col("msg"),
        recoveryTimeoutMs = 150L)
      assert(d2 === 8 && drop2 === 0)
      assert(aOk.get() > 0, "recovered target serves traffic again")
      assert(Http.LoadBalancer.forTargets(urls.toList, 150L).failedUrls
        === Seq.empty)
    }
  }

  test("persistent 5xx fails the write after bounded retries") {
    withServer { (server, port) =>
      server.createContext("/down", (ex: HttpExchange) => {
        body(ex); ex.sendResponseHeaders(500, -1); ex.close()
      })
      val df = spark.range(2).selectExpr("cast(id AS string) AS msg").coalesce(1)
      intercept[org.apache.spark.SparkException] {
        Http.write(df, s"http://127.0.0.1:$port/down", col("msg"), retries = 1)
      }
    }
  }
}
