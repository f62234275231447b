package graft

import java.net.InetSocketAddress
import java.util.Collections
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.sinks.Http

/** http() destination: codegen-rendered bodies, batch-lines batching,
  * 4xx drop vs 5xx retry semantics (reference modules/http/http-dest.c). */
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

  test("5xx is retried until success; 4xx drops without failing the job") {
    withServer { (server, port) =>
      val calls = new AtomicInteger(0)
      server.createContext("/flaky", (ex: HttpExchange) => {
        body(ex)
        if (calls.incrementAndGet() == 1) ex.sendResponseHeaders(503, -1)
        else ex.sendResponseHeaders(200, -1)
        ex.close()
      })
      server.createContext("/reject", (ex: HttpExchange) => {
        body(ex); ex.sendResponseHeaders(400, -1); ex.close()
      })
      val df = spark.range(3).selectExpr("concat('r', id) AS msg").coalesce(1)
      val (d1, _) = Http.write(df, s"http://127.0.0.1:$port/flaky", col("msg"),
        batchLines = 3)
      assert(d1 === 3 && calls.get() === 2) // one 503 + one success
      val (d2, drop2) = Http.write(df, s"http://127.0.0.1:$port/reject", col("msg"))
      assert(d2 === 0 && drop2 === 3)
    }
  }

  test("3xx drops like 4xx (non-retryable), and null bodies count as dropped") {
    withServer { (server, port) =>
      server.createContext("/moved", (ex: HttpExchange) => {
        body(ex); ex.sendResponseHeaders(301, -1); ex.close()
      })
      val df = spark.range(4)
        .selectExpr("CASE WHEN id < 2 THEN concat('m', id) END AS msg").coalesce(1)
      // 2 null bodies dropped up front; 2 rendered rows dropped by the 301
      val (d, drop) = Http.write(df, s"http://127.0.0.1:$port/moved", col("msg"))
      assert(d === 0 && drop === 4)
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
