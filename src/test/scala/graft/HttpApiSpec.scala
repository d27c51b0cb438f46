package graft

import graft.api.{GraftDb, GraftHttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end HTTP flow against the reference's endpoint shapes
  * (reference: engine/server/web_server/web_controller.hpp; golden flow
  * mirrors engine/test/bindings/python/test.py — create, insert with
  * dup-PK skip, query, filtered query, delete, statistics). */
class HttpApiSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val server =
    new GraftHttpServer(new GraftDb(spark, tmpDir("graft_http"))).start()
  private lazy val base = s"http://127.0.0.1:${server.actualPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = server.stop()

  private def get(path: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def post(path: String, body: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def delete(path: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def docsOf(resp: String): Seq[String] =
    (JsonMethods.parse(resp) \ "result").asInstanceOf[JArray].arr.map(r =>
      (r \ "Doc") match { case JString(s) => s; case other => fail(s"no Doc: $other") })

  test("state and welcome endpoints") {
    assert(get("/")._2.contains("Welcome"))
    val (code, body) = get("/state")
    assert(code == 200)
    assert((JsonMethods.parse(body) \ "message") == JString("Server is online!"))
  }

  test("five-city golden flow over HTTP: create, insert(dup), query, filter, delete, stats") {
    val (cc, cb) = post("/api/default/schema/tables",
      """{"name":"MyTable","fields":[
        |{"name":"ID","dataType":"INT","primaryKey":true},
        |{"name":"Doc","dataType":"STRING"},
        |{"name":"Embedding","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    assert(cc == 200, cb)

    val (sc, sb) = get("/api/default/schema/tables/show")
    assert(sc == 200)
    assert((JsonMethods.parse(sb) \ "result") == JArray(List(JString("MyTable"))))

    val (ic, ib) = post("/api/default/data/insert",
      """{"table":"MyTable","data":[
        |{"ID":1,"Doc":"Berlin","Embedding":[0.05,0.61,0.76,0.74]},
        |{"ID":2,"Doc":"London","Embedding":[0.19,0.81,0.75,0.11]},
        |{"ID":3,"Doc":"Moscow","Embedding":[0.36,0.55,0.47,0.94]},
        |{"ID":4,"Doc":"San Francisco","Embedding":[0.18,0.01,0.85,0.80]},
        |{"ID":5,"Doc":"Shanghai","Embedding":[0.24,0.18,0.22,0.44]},
        |{"ID":1,"Doc":"Berlin","Embedding":[0.05,0.61,0.76,0.74]}]}""".stripMargin)
    assert(ic == 200, ib)
    val insJson = JsonMethods.parse(ib)
    assert((insJson \ "result" \ "inserted") == JInt(5), ib)
    assert((insJson \ "result" \ "skipped") == JInt(1), ib)

    val (qc, qb) = post("/api/default/data/query",
      """{"table":"MyTable","queryVector":[0.35,0.55,0.47,0.94],
        |"limit":6,"withDistance":true}""".stripMargin)
    assert(qc == 200, qb)
    assert(docsOf(qb) == Seq("Moscow", "Berlin", "Shanghai", "San Francisco", "London"))

    val (fc, fb) = post("/api/default/data/query",
      """{"table":"MyTable","queryVector":[0.35,0.55,0.47,0.94],
        |"limit":6,"filter":"ID <= 2"}""".stripMargin)
    assert(fc == 200)
    assert(docsOf(fb) == Seq("Berlin", "London"))

    // serve:true over HTTP: table is below the index threshold here, so
    // the server transparently falls back to the job path (full rows)
    val (vc, vb) = post("/api/default/data/query",
      """{"table":"MyTable","queryVector":[0.35,0.55,0.47,0.94],
        |"limit":2,"serve":true}""".stripMargin)
    assert(vc == 200, vb)
    assert(docsOf(vb) == Seq("Moscow", "Berlin"))

    val (pc, pb) = post("/api/default/data/insertprepare",
      """{"table":"MyTable","primaryKeys":[1,2,3,9,10]}""")
    assert(pc == 200, pb)
    // bits 0-2 cleared (pks exist), bits 3-4 set, rest of the word set
    assert((JsonMethods.parse(pb) \ "result" \ "bitmask") == JArray(List(JInt(-8))), pb)

    val (gc, gb) = post("/api/default/data/get",
      """{"table":"MyTable","filter":"ID > 2","response":["ID","Doc"]}""")
    assert(gc == 200)
    assert(docsOf(gb) == Seq("Moscow", "San Francisco", "Shanghai"))

    val (dc, db2) = post("/api/default/data/delete",
      """{"table":"MyTable","primaryKeys":[1,2,3,4]}""")
    assert(dc == 200)
    assert((JsonMethods.parse(db2) \ "result" \ "deleted") == JInt(4), db2)

    val (qc2, qb2) = post("/api/default/data/query",
      """{"table":"MyTable","queryVector":[0.35,0.55,0.47,0.94],"limit":6}""")
    assert(qc2 == 200)
    assert(docsOf(qb2) == Seq("Shanghai"))

    val (stc, stb) = get("/api/default/statistics")
    assert(stc == 200)
    val stats = (JsonMethods.parse(stb) \ "result").asInstanceOf[JArray].arr
    assert(stats.exists(s => (s \ "table") == JString("MyTable") &&
      (s \ "totalRecords") == JInt(1)), stb)

    val (rc, rb) = post("/api/rebuild", "{}")
    assert(rc == 200, rb) // below index threshold: finishes with 0 rebuilds

    val (delc, _) = delete("/api/default/schema/tables/MyTable")
    assert(delc == 200)
    assert((JsonMethods.parse(get("/api/default/schema/tables/show")._2) \ "result")
      == JArray(Nil))
  }

  test("statistics exposes index cardinality stats (per-dim posting counts) over HTTP") {
    val (cc, cb) = post("/api/default/schema/tables",
      """{"name":"SpStats","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":64,
        | "metricType":"DOT_PRODUCT"}]}""".stripMargin)
    assert(cc == 200, cb)
    // every row carries dim 0 (the hot dim the serving guard watches)
    val data = (1 to 20).map(i =>
      s"""{"ID":$i,"SV":{"indices":[0,${10 + i % 5}],"values":[1.0,0.5]}}""")
      .mkString("[", ",", "]")
    val (ic, ib) = post("/api/default/data/insert",
      s"""{"table":"SpStats","data":$data}""")
    assert(ic == 200, ib)
    val (rc, rb) = post("/api/rebuild", "{}")
    assert(rc == 200, rb)
    val (stc, stb) = get("/api/default/statistics")
    assert(stc == 200)
    val stats = (JsonMethods.parse(stb) \ "result").asInstanceOf[JArray].arr
    val spStats = stats.find(s => (s \ "table") == JString("SpStats"))
      .getOrElse(fail(s"no SpStats entry: $stb"))
    val idxStats = (spStats \ "indexes").asInstanceOf[JArray].arr
    assert(idxStats.exists(s => (s \ "field") == JString("SV") &&
      (s \ "type") == JString("sparse") &&
      (s \ "dims") == JInt(6) &&             // dim 0 + dims 10..14
      (s \ "postings") == JInt(40) &&        // 2 nonzeros x 20 rows
      (s \ "maxDimPostings") == JInt(20)),   // the hot dim
      stb)
    delete("/api/default/schema/tables/SpStats")
  }

  test("multi-database endpoints: load, isolated tables, unload, drop") {
    val (lc, lb) = post("/api/load", """{"name":"second"}""")
    assert(lc == 200, lb)
    val (cc, _) = post("/api/second/schema/tables",
      """{"name":"Only","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true}]}""".stripMargin)
    assert(cc == 200)
    // the table exists in `second`, not in `default`
    assert((JsonMethods.parse(get("/api/second/schema/tables/show")._2) \ "result")
      == JArray(List(JString("Only"))))
    assert(!((JsonMethods.parse(get("/api/default/schema/tables/show")._2) \ "result")
      .asInstanceOf[JArray].arr.contains(JString("Only"))))
    // unloaded databases 404 on access; unknown db errors cleanly
    assert(post("/api/second/unload", "")._1 == 200)
    assert(post("/api/second/unload", "")._1 == 404)
    assert(post("/api/second/data/get", """{"table":"Only"}""")._1 >= 400)
    // reload finds the files again; drop removes them
    assert(post("/api/load", """{"name":"second"}""")._1 == 200)
    assert((JsonMethods.parse(get("/api/second/schema/tables/show")._2) \ "result")
      == JArray(List(JString("Only"))))
    assert(delete("/api/second/drop")._1 == 200)
    assert(post("/api/load", """{"name":"second"}""")._1 == 200)
    assert((JsonMethods.parse(get("/api/second/schema/tables/show")._2) \ "result")
      == JArray(Nil))
    delete("/api/second/drop")
  }

  test("error shapes: bad payload 400/500, unknown route 404") {
    assert(post("/api/default/data/insert", """{"data":[]}""")._1 >= 400)
    assert(get("/api/nope")._1 == 404)
    val (_, body) = get("/api/nope")
    assert((JsonMethods.parse(body) \ "statusCode") == JInt(404))
  }
}
