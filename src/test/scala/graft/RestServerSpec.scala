package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Integration gate for the REST serving tier: the reference's
  * upload → search → chat → delete lifecycle driven END TO END through
  * real HTTP against the stub providers, plus the openapi payload
  * polymorphism (document = string | array | object) and the zstd
  * middleware round-trip. */
object RestServerSpec {
  /** JVM-static so executor-side invocations land in the same counter
    * under local mode; counts TEXTS embedded, not batches. */
  val embedCalls = new java.util.concurrent.atomic.AtomicLong(0)

  final case class CountingProvider(dim: Int) extends graft.functions.EmbedProvider {
    private val inner = graft.functions.NoopProvider(dim)
    def embedBatch(texts: Seq[String]): Seq[Array[Byte]] = {
      embedCalls.addAndGet(texts.size.toLong)
      inner.embedBatch(texts)
    }
  }
}

class RestServerSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private lazy val server = {
    val dir = java.nio.file.Files.createTempDirectory("rest").toString
    val s = new graft.server.RestServer(spark, dir)
    s.start()
    s
  }
  private def url(p: String) = s"http://localhost:${server.port}$p"

  private def post(path: String, body: String,
      headers: Seq[(String, String)] = Nil): HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(url(path)))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }

  private def json(r: HttpResponse[Array[Byte]]) =
    mapper.readTree(new String(r.body(), UTF_8))

  test("upload -> search -> chat -> delete lifecycle over HTTP") {
    // upload: all three payload shapes from openapi.yml's example
    val up = post("/api/upload",
      """{"owner":"o1","category":"stories","documents":[
        |{"external_id":"abc123","document":"Once upon a time there was a hidden kingdom"},
        |{"document":["In a galaxy far, far away","ships sailed the void"]},
        |{"document":{"story":"The Force Awakens","author":"jj"}}
        |]}""".stripMargin)
    assert(up.statusCode() == 200)
    val ids = json(up).get("document_ids").elements()
    val idSeq = Iterator.continually(ids).takeWhile(_.hasNext).map(_.next().asLong()).toSeq
    assert(idSeq == Seq(1L, 2L, 3L))

    // search: self-text must find its own document first (noop embed is
    // deterministic in the text)
    val sr = post("/api/search",
      """{"text":"Once upon a time there was a hidden kingdom","count":2}""")
    assert(sr.statusCode() == 200)
    val docs = json(sr).get("documents")
    assert(docs.size() == 2)
    assert(docs.get(0).get("document_id").asLong() == 1L)
    assert(docs.get(0).get("external_id").asText() == "abc123")
    assert(docs.get(0).get("document").asText().contains("Once upon a time"))
    assert(docs.get(0).get("document_similarity").asDouble() >
      docs.get(1).get("document_similarity").asDouble() - 1e-9)

    // no_documents omits the payload
    val srNd = post("/api/search",
      """{"text":"Once upon a time there was a hidden kingdom","count":1,"no_documents":true}""")
    assert(!json(srNd).get("documents").get(0).has("document"))

    // object payload round-trips as an OBJECT, not a string
    val srObj = post("/api/search",
      """{"text":"story: The Force Awakens","count":3}""")
    val objHit = json(srObj).get("documents").elements().asScala
      .find(_.get("document_id").asLong() == 3L).get
    assert(objHit.get("document").isObject)
    assert(objHit.get("document").get("story").asText() == "The Force Awakens")

    // chat: stub provider echoes the assembled prompt's last message;
    // context doc 1 is fetched by id into the prompt
    val ch = post("/api/chat",
      """{"text":"Tell me about the document","document_ids":[1]}""")
    assert(ch.statusCode() == 200)
    val reply = new String(ch.body(), UTF_8)
    assert(reply.nonEmpty)

    // categories
    val cats = post("/api/categories", """{"owner":"o1"}""")
    assert(json(cats).get("category_names").get(0).asText() == "stories")

    // delete document 1 -> search must not return it anymore
    val del = post("/api/delete/document", """{"document_id":1}""")
    assert(del.statusCode() == 200 &&
      new String(del.body(), UTF_8) == "{}")
    val sr2 = post("/api/search",
      """{"text":"Once upon a time there was a hidden kingdom","count":3}""")
    val left = json(sr2).get("documents").elements().asScala
      .map(_.get("document_id").asLong()).toSet
    assert(!left.contains(1L) && left.nonEmpty)

    // delete by owner wipes the rest
    val delO = post("/api/delete/owner", """{"owner":"o1"}""")
    assert(delO.statusCode() == 200)
    val sr3 = post("/api/search", """{"text":"anything","count":5}""")
    assert(json(sr3).get("documents").size() == 0)
  }

  test("zstd content negotiation round-trips requests and responses") {
    import com.github.luben.zstd.Zstd
    val body =
      """{"documents":[{"external_id":"z1","document":"compressed zebra stripes pattern"}]}"""
    val compressed = Zstd.compress(body.getBytes(UTF_8))
    val req = HttpRequest.newBuilder(URI.create(url("/api/upload")))
      .header("Content-Encoding", "zstd")
      .header("Accept-Encoding", "zstd")
      .POST(HttpRequest.BodyPublishers.ofByteArray(compressed))
      .build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Encoding").orElse("") == "zstd")
    val decompressed = {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(r.body()))
      new String(in.readAllBytes(), UTF_8)
    }
    val node = mapper.readTree(decompressed)
    assert(node.get("document_ids").size() == 1)
  }

  test("upload embeds each chunk exactly once (batch pinned across writes)") {
    // the upload handler runs THREE actions over the embedded batch
    // (index write, chunk append, and k-means on cold bootstrap); without
    // the localCheckpoint pin each action re-invokes the embed provider
    val dir = java.nio.file.Files.createTempDirectory("rest-embed").toString
    RestServerSpec.embedCalls.set(0)
    val s = new graft.server.RestServer(spark, dir,
      embedProvider = Some(RestServerSpec.CountingProvider(64)))
    s.start()
    try {
      def up(body: String) = {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://localhost:${s.port}/api/upload"))
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofByteArray())
        assert(r.statusCode() == 200)
      }
      // cold path: first batch also trains the IVF model it is assigned to
      up("""{"documents":[{"document":"first short doc"},{"document":"second short doc"}]}""")
      assert(RestServerSpec.embedCalls.get() == 2L,
        s"cold upload re-embedded: ${RestServerSpec.embedCalls.get()} calls for 2 chunks")
      // warm path: model exists, assign only
      up("""{"documents":[{"document":"third short doc"}]}""")
      assert(RestServerSpec.embedCalls.get() == 3L,
        s"warm upload re-embedded: ${RestServerSpec.embedCalls.get()} calls for 3 chunks")
    } finally s.stop()
  }

  test("restart on the same dataDir rebuilds model + id counter from storage") {
    // the server's only in-memory state (centroid matrix, id counter) must
    // be recoverable: a restarted instance serves the old corpus and
    // continues the id sequence without collisions
    val dir = java.nio.file.Files.createTempDirectory("rest-restart").toString
    def post2(port: Int, path: String, body: String) = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofByteArray())
    // capture a search page as (id, similarity) pairs — the full served
    // ranking, not just the winner
    def page(port: Int, text: String, count: Int = 3,
        centroids: Int = 1): Seq[(Long, Double)] = {
      val r = post2(port, "/api/search",
        s"""{"text":${mapper.writeValueAsString(text)},"count":$count,"no_documents":true,"centroids":$centroids}""")
      assert(r.statusCode() == 200)
      json(r).get("documents").elements().asScala
        .map(d => (d.get("document_id").asLong(),
          d.get("document_similarity").asDouble())).toSeq
    }
    // a corpus big enough for MULTIPLE lists (150 docs / listSize 64 →
    // k=3): with one list any centroid matrix serves the same rows, so
    // only a multi-list corpus can detect a restart that rebuilds a
    // DIFFERENT model (default nprobe=1 would probe different lists)
    val nDocs = 150
    val docsJson = (1 to nDocs)
      .map(i => s"""{"document":"document number $i about topic ${i % 17} in register ${i % 5}"}""")
      .mkString("[", ",", "]")
    val a = new graft.server.RestServer(spark, dir)
    a.start()
    val upA = post2(a.port, "/api/upload",
      s"""{"owner":"o2","documents":$docsJson}""")
    assert(upA.statusCode() == 200)
    val queries = Seq("alpha probe", "beta probe", "gamma probe",
      "document number 7 about topic 7 in register 2", "register 4")
    val before = queries.map(q => page(a.port, q))
    assert(before.forall(_.nonEmpty))
    a.stop()

    val b = new graft.server.RestServer(spark, dir)
    b.start()
    try {
      // the restart contract: the persisted model is the SAME model the
      // corpus was indexed under, so every search probes the same lists
      // and serves bit-identical pages (the noop embed is deterministic)
      val after = queries.map(q => page(b.port, q))
      assert(after == before,
        s"restarted server served a different ranking:\n  before=$before\n  after =$after")
      // the id sequence continues past the stored max — no collision
      val upB = post2(b.port, "/api/upload",
        """{"documents":[{"document":"a wholly new extra document"}]}""")
      assert(upB.statusCode() == 200)
      val newId = json(upB).get("document_ids").get(0).asLong()
      assert(newId == nDocs + 1L, s"restarted id counter collided: got $newId")
      // and the delete cascade still resolves storage written pre-restart
      // (centroids=-1 probes ALL lists, so absence is model-independent)
      val del = post2(b.port, "/api/delete/document", """{"document_id":1}""")
      assert(del.statusCode() == 200)
      val left = page(b.port, "document number 1 about topic 1 in register 1",
        count = 20, centroids = -1).map(_._1).toSet
      assert(!left.contains(1L) && left.nonEmpty)
    } finally b.stop()
  }

  test("tenant scope join is size-gated: broadcast small, merge (never broadcast) large") {
    // the factored scopedIndex is the exact join handleSearch builds;
    // pin the physical plan on BOTH sides of the gate
    val base = spark.range(200).selectExpr("id as vec_id",
      "id % 40 as document_id", "cast(id % 3 as int) as centroid_id")
    val scope = spark.range(10).selectExpr("id as document_id")
    def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // materialize so AQE's final plan is the one inspected
      df.queryExecution.executedPlan.toString
    }
    val small = executedPlan(
      graft.server.RestServer.scopedIndex(base, scope, knownCount = 10, rowLimit = 100))
    assert(small.contains("BroadcastHashJoin"),
      s"request-sized scope must broadcast:\n$small")
    val large = executedPlan(
      graft.server.RestServer.scopedIndex(base, scope, knownCount = 10, rowLimit = 5))
    assert(!large.contains("BroadcastExchange"),
      s"scope above the gate must NOT broadcast (driver OOM at tenant scale):\n$large")
    assert(large.contains("SortMergeJoin"),
      s"above the gate the semi join must be the merge fallback:\n$large")
  }

  test("large-tenant regime: scoped search + owner delete work with the gate forced to merge") {
    // broadcastRowLimit=1 makes EVERY tenant scope take the
    // no-broadcast, no-driver-collect path — the 100 TB regime in
    // miniature, end-to-end over HTTP
    val dir = java.nio.file.Files.createTempDirectory("rest-tenant").toString
    val s = new graft.server.RestServer(spark, dir, broadcastRowLimit = 1L)
    s.start()
    def post2(path: String, body: String) = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:${s.port}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofByteArray())
    try {
      assert(post2("/api/upload",
        """{"owner":"big","documents":[{"document":"big tenant doc one"},{"document":"big tenant doc two"}]}""")
        .statusCode() == 200)
      assert(post2("/api/upload",
        """{"owner":"other","category":"keep","documents":[{"document":"other tenant doc"}]}""")
        .statusCode() == 200)
      // owner-scoped search rides the merge-gated semi join
      val sr = json(post2("/api/search",
        """{"text":"big tenant doc one","owner":"big","count":5,"centroids":-1}"""))
      val ids = sr.get("documents").elements().asScala
        .map(_.get("document_id").asLong()).toSet
      assert(ids == Set(1L, 2L), s"owner scope leaked: $ids")
      // owner delete keeps victims a DataFrame end-to-end (no collect)
      assert(post2("/api/delete/owner", """{"owner":"big"}""").statusCode() == 200)
      val after = json(post2("/api/search",
        """{"text":"big tenant doc one","count":5,"centroids":-1}"""))
      val leftIds = after.get("documents").elements().asScala
        .map(_.get("document_id").asLong()).toSet
      assert(leftIds == Set(3L), s"delete/owner cascade wrong: $leftIds")
      val cats = json(post2("/api/categories", "{}"))
      assert(cats.get("category_names").size() == 1)
    } finally s.stop()
  }

  test("invalid method and malformed body map to the reference's statuses") {
    val get = client.send(
      HttpRequest.newBuilder(URI.create(url("/api/chat"))).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(get.statusCode() == 405)
    val bad = post("/api/search", "{not json")
    assert(bad.statusCode() == 400)
    assert(json(bad).get("error").asText() == "Invalid request")
  }
}
