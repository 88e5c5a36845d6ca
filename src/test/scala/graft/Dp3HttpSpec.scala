package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Dp3Http, Dp3Service}
import graft.model.EventsCatalog

/** End-to-end HTTP surface over localhost against the sf0.001 catalog —
  * the reference's route table (server/routes/routes.go:49-72) driven
  * through real sockets. */
class Dp3HttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new EventsCatalog(dir)
  private lazy val svc = new Dp3Service(cat, s => cat.messages(s))

  private lazy val http = {
    val h = new Dp3Http(svc, spark).start()
    sys.addShutdownHook(h.stop())
    h
  }
  private lazy val base = s"http://127.0.0.1:${http.boundPort}"
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET()
      .build(), HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET / identifies the service") {
    val r = get("/")
    assert(r.statusCode() == 200 && r.body() == "dp3")
  }

  test("POST query returns NDJSON rows; skeleton strips payload") {
    val r = post("/databases/default/query",
      """{"query": "from p3 click limit 3;"}""")
    assert(r.statusCode() == 200, r.body())
    val lines = r.body().linesIterator.toSeq
    assert(lines.length == 3)
    assert(lines.forall(l => l.startsWith("{") && l.contains("\"topic\"")))
    assert(lines.head.contains("\"k\"")) // payload present on full query

    val sk = post("/databases/default/query",
      """{"query": "from p3 click limit 3;", "skeleton": true}""")
    val skLines = sk.body().linesIterator.toSeq
    assert(skLines.length == 3)
    assert(skLines.forall(l => !l.contains("\"k\"") && l.contains("\"seq\"")))
  }

  test("query errors map to 400 with the parse message") {
    val noSemi = post("/databases/default/query",
      """{"query": "from p3 click"}""")
    assert(noSemi.statusCode() == 400)
    assert(noSemi.body().contains("semicolon"))
    val bad = post("/databases/default/query",
      """{"query": "from p3 click where nope;"}""")
    assert(bad.statusCode() == 400, bad.body())
  }

  test("catalog listings: topics and producers") {
    val topics = get("/databases/default/topics")
    assert(topics.statusCode() == 200)
    assert(topics.body().linesIterator.exists(_.contains("click")))
    val producers = get("/databases/default/producers")
    assert(producers.body().linesIterator.exists(_.contains("p3")))
  }

  test("statistics endpoint honors granularity") {
    val r = get("/databases/default/statistics?granularity=3600000000000"
      + "&groupByProducer=true")
    assert(r.statusCode() == 200)
    assert(r.body().linesIterator.nonEmpty)
    val missing = get("/databases/default/statistics")
    assert(missing.statusCode() == 400)
  }

  test("statrange accepts GET params and the reference's POST body") {
    val viaGet = get("/statrange?granularity=60000000000")
    assert(viaGet.statusCode() == 200)
    assert(viaGet.body().linesIterator.nonEmpty)
    val viaPost = post("/statrange",
      """{"granularity": 60000000000, "producer": "p3"}""")
    assert(viaPost.statusCode() == 200)
    assert(viaPost.body().linesIterator.size
      <= viaGet.body().linesIterator.size)
  }

  test("unknown route is a JSON 404") {
    val r = get("/nope")
    assert(r.statusCode() == 404 && r.body().contains("error"))
  }
}
