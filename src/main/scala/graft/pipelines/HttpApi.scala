package graft.pipelines

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** HTTP wrapper mirroring the reference's Flask surface (main.py:22-280):
  * `POST /sync/{refresh|full_reindex|lists|tasks|accounts|apps}`,
  * `GET /health` (main.py:210-222) and a self-describing root
  * (main.py:225-280). Built on the JDK's HttpServer — no extra
  * dependencies; one shared SparkSession serves all requests (the
  * reference runs the pipeline in-process the same way, main.py:35-41).
  *
  * Query params stand in for the reference's env/arg config:
  *   /sync/refresh?days=60&today=2026-08-12&in=raw&warehouse=wh
  */
object HttpApi {

  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("PORT", "8080").toInt
    val spark = GraftSession.local()
    val server = start(spark, port)
    println(s"graft http api listening on :$port")
    server.getAddress // keep reference
    Thread.currentThread().join()
  }

  def start(spark: SparkSession, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(spark, ex))
    server.setExecutor(null) // serialize requests, like the reference's single worker
    server.start()
    server
  }

  /** JSON string escape covering quotes, backslashes, and control chars —
    * exception messages and captured logs routinely contain newlines.
    */
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def handle(spark: SparkSession, ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap
    try {
      (ex.getRequestMethod, path) match {
        case ("GET", "/") =>
          respond(ex, 200, Main.describe)
        case ("GET", "/health") =>
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out)) {
            Main.run(spark, "health", params)
          }
          respond(ex, 200, out.toString(StandardCharsets.UTF_8))
        case ("POST", p) if p.startsWith("/sync/") =>
          val cmd = p.stripPrefix("/sync/")
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out)) {
            Main.run(spark, cmd, params)
          }
          respond(ex, 200, s"""{"status":"success","detail":${
            jsonStr(out.toString(StandardCharsets.UTF_8).trim)}}""")
        case (m, p) =>
          respond(ex, 404, s"""{"status":"error","detail":${jsonStr(s"no route $m $p")}}""")
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500, s"""{"status":"error","detail":${
          jsonStr(Option(e.getMessage).getOrElse(e.getClass.getName))}}""")
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type",
      if (body.startsWith("{")) "application/json" else "text/plain")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }
}
