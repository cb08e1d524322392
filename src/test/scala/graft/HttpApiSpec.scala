package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import graft.pipelines.HttpApi

/** Drive the HTTP surface end-to-end: sync a pipeline over fixture JSON,
  * then probe /health and the self-describing root.
  */
class HttpApiSpec extends SparkSpec {

  test("POST /sync/lists + GET /health + GET / round-trip") {
    val server = HttpApi.start(spark, 0) // ephemeral port
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      def get(p: String) = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$p")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      def post(p: String) = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$p"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())

      val root = get("/")
      assert(root.statusCode() == 200)
      assert(root.body().contains("full_reindex"))

      val in = Files.createTempDirectory("graft_http_in").toString
      val wh = Files.createTempDirectory("graft_http_wh").toString
      Files.createDirectories(Paths.get(in, "spaces"))
      Files.writeString(Paths.get(in, "spaces", "s.json"),
        """{"id":"s1","name":"S","archived":false}""")
      Files.createDirectories(Paths.get(in, "folders"))
      Files.writeString(Paths.get(in, "folders", "f.json"),
        """{"id":"f1","name":"F","space_id":"s1","archived":false}""")
      Files.createDirectories(Paths.get(in, "lists"))
      Files.writeString(Paths.get(in, "lists", "l.json"),
        """{"id":"l1","name":"L","space_id":"s1","folder_id":"f1","archived":false}""")

      val sync = post(s"/sync/lists?in=$in&warehouse=$wh")
      assert(sync.statusCode() == 200, sync.body())
      assert(sync.body().contains("success"))
      assert(spark.read.parquet(s"$wh/dim_lists").count() == 1)

      val health = get(s"/health?warehouse=$wh")
      assert(health.statusCode() == 200)
      assert(health.body().contains("dim_lists=1"))

      val missing = post("/sync/nonsense")
      assert(missing.statusCode() == 500)
      assert(missing.body().contains("error"))

      val noRoute = get("/sync/lists") // GET on a POST route
      assert(noRoute.statusCode() == 404)
    } finally server.stop(0)
  }
}
