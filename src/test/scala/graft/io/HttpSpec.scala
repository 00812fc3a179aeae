package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** HTTP transport + distributed fetch against a local mock API server —
  * the SURVEY §5 "mock Labelbox API" end-to-end check, localhost-only.
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def withServer[T](f: (String, AtomicInteger) => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val uploads = new AtomicInteger(0)
    val failFirst = new AtomicInteger(0)
    server.createContext("/upload", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes())
        val n = body.count(_ == '{') // crude element count of the JSON array
        uploads.addAndGet(n)
        respond(x, 200, """{"ok":true}""")
      }
    })
    server.createContext("/flaky", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        x.getRequestBody.readAllBytes()
        if (failFirst.getAndIncrement() == 0) respond(x, 503, "busy")
        else { respond(x, 200, "ok") }
      }
    })
    server.createContext("/frames/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val id = x.getRequestURI.getPath.split('/').last
        if (id == "404") respond(x, 404, "nope")
        else respond(x, 200, s"""{"frame":$id,"objects":[{"title":"car"}]}""")
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", uploads)
    finally server.stop(0)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  test("JsonPostTransport uploads batches through both sink paths") {
    withServer { (base, uploads) =>
      val t = new Http.JsonPostTransport(s"$base/upload")
      val df = spark.range(7).select(concat(lit("""{"id":"""), col("id"), lit("}")).as("p"))
      val n = BatchedSink.uploadDriverSide(df, col("p"), t, batchSize = 3)
      assert(n == 7L && uploads.get() == 7)
      uploads.set(0)
      BatchedSink.uploadDistributed(df, col("p"), t, batchSize = 3)
      assert(uploads.get() == 7)
    }
  }

  test("transport retries transient failures with backoff") {
    withServer { (base, _) =>
      val t = new Http.JsonPostTransport(s"$base/flaky", maxRetries = 2)
      assert(t.send(Seq("""{"a":1}""")) == 1) // first attempt 503, retry 200
    }
  }

  test("distributed per-row fetch: bodies + tolerated errors + S2 export parse") {
    withServer { (base, _) =>
      val urls = (Seq("1", "2", "404", "3")).map(i => s"$base/frames/$i").toDF("url")
      val fetched = Http.fetchPerRow(urls, "url").collect()
      assert(fetched.count(_.getString(2) == null) == 3)
      assert(fetched.exists(r => r.getString(2) != null && r.getString(0).endsWith("404")))

      val export = Http.fetchExport(spark, urls, "url")
      assert(export.count() == 3)
      assert(export.columns.toSet == Set("frame", "objects"))
      assert(export.agg(sum(col("frame"))).collect().head.getLong(0) == 6L)
    }
  }
}
