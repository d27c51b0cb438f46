package graft

import graft.api.{GraftCatalog, GraftClient, GraftClientException, GraftHttpServer}
import org.json4s._

/** External-client lifecycle over real HTTP — the analog of the
  * reference's Python-bindings test + 32-thread concurrent_test.py
  * (engine/test/bindings/python/), driven through GraftClient. */
class ClientSpec extends SparkSpec {

  private def withServer(f: (GraftHttpServer, GraftClient) => Unit): Unit = {
    val srv = new GraftHttpServer(new GraftCatalog(spark, tmpDir("client")), 0).start()
    try f(srv, new GraftClient(s"http://127.0.0.1:${srv.actualPort}"))
    finally srv.stop()
  }

  test("full lifecycle through the client: load, table DDL, DML, search, stats, drop") {
    withServer { (_, c) =>
      assert(c.state())
      c.loadDb("clientdb")
      c.useDb("clientdb")
      c.createTable(
        """{"name":"C","fields":[
          |{"name":"ID","dataType":"INT","primaryKey":true},
          |{"name":"Tag","dataType":"STRING"},
          |{"name":"Vec","dataType":"VECTOR_FLOAT","dimensions":4,
          | "metricType":"EUCLIDEAN"}]}""".stripMargin)
      assert(c.listTables() == Seq("C"))

      val data = (0 until 600).map(i =>
        s"""{"ID":$i,"Tag":"t${i % 3}","Vec":[$i,0,0,0]}""").mkString("[", ",", "]")
      val (ins, skip) = c.insert("C", data)
      assert(ins == 600 && skip == 0)
      // duplicate batch: first-wins counters through the client
      val (ins2, skip2) = c.insert("C", """[{"ID":0,"Tag":"dup","Vec":[9,9,9,9]}]""")
      assert(ins2 == 0 && skip2 == 1)

      c.rebuild()
      // job-path search with filter + distance
      val hits = c.query(
        """{"table":"C","queryField":"Vec","queryVector":[0,0,0,0],
          |"limit":3,"filter":"Tag = 't1'","response":["ID"],
          |"withDistance":true}""".stripMargin)
      assert(hits.map(h => (h \ "ID") match { case JInt(i) => i.toInt; case _ => -1 })
        == List(1, 4, 7))
      // serving path returns (__row_id, @distance)
      val served = c.queryRaw(
        """{"table":"C","queryVector":[0,0,0,0],"limit":2,"serve":true}""")
      assert((served \ "served") == JBool(true))

      val page = c.get("""{"table":"C","filter":"ID < 10","skip":2,"limit":3,
        |"response":["ID","Tag"]}""".stripMargin)
      assert(page.map(h => (h \ "ID") match { case JInt(i) => i.toInt; case _ => -1 })
        == List(2, 3, 4))

      assert(c.delete("""{"table":"C","filter":"ID >= 590"}""") == 10)
      val stats = c.statistics()
      assert(stats.exists(s => (s \ "totalRecords") == JInt(590)))

      // error mapping: bad request surfaces the server message client-side
      val e = intercept[GraftClientException](
        c.createTable("""{"name":"C","fields":[]}"""))
      assert(e.statusCode != 200)

      c.dropTable("C")
      assert(c.listTables().isEmpty)
    }
  }

  test("32 client threads hammer search/get/insert concurrently (concurrent_test analog)") {
    withServer { (_, c) =>
      c.loadDb("conc")
      c.useDb("conc")
      c.createTable(
        """{"name":"K","fields":[
          |{"name":"ID","dataType":"INT","primaryKey":true},
          |{"name":"Vec","dataType":"VECTOR_FLOAT","dimensions":4,
          | "metricType":"EUCLIDEAN"}]}""".stripMargin)
      val data = (0 until 600).map(i =>
        s"""{"ID":$i,"Vec":[$i,0,0,0]}""").mkString("[", ",", "]")
      c.insert("K", data)
      c.rebuild()

      // read-heavy like the reference's concurrent_test.py: 30 reader
      // threads + 2 writers (every store commit is a full parquet write
      // cycle serialized on the writer lock — more writers would just
      // monopolize the server pool and measure queueing, not correctness)
      val cw = new GraftClient(c.baseUrl, timeoutMs = 120000).useDb("conc")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val errs = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = (0 until 32).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            if (t < 2) { // writer: upserts race the readers
              var i = 0
              while (i < 5) {
                cw.insert("K", s"""[{"ID":${1000 + t},"Vec":[$t,$i,1,1]}]""", upsert = true)
                i += 1
              }
            } else {
              var i = 0
              while (i < 20) {
                if (t % 2 == 0) {
                  val r = c.query(
                    s"""{"table":"K","queryVector":[${t % 5},0,0,0],"limit":5,"serve":true}""")
                  if (r.isEmpty) errs.incrementAndGet()
                } else {
                  val r = c.get(s"""{"table":"K","filter":"ID < ${50 + t}","limit":5}""")
                  if (r.isEmpty) errs.incrementAndGet()
                }
                i += 1
              }
            }
          } catch { case _: Throwable => errs.incrementAndGet() }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      assert(errs.get() == 0, s"${errs.get()} client failures under concurrency")
    }
  }
}
