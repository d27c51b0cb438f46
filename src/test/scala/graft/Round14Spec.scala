package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Round 14: the sparse recall-floor empty-hits guard (round-13 ADVICE
  * high — `hits.last` evaluated before the isEmpty check threw out of
  * query() instead of declining to the job path). */
class Round14Spec extends SparkSpec {

  private def resultIds(resp: String, key: String = "__row_id"): Seq[Long] =
    (JsonMethods.parse(resp) \ "result") match {
      case JArray(rows) => rows.map(r => (r \ key) match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d.toLong
        case other => fail(s"bad $key in $resp: $other")
      })
      case other => fail(s"no result array in $resp: $other")
    }

  test("sparse recall floor with ZERO overlap candidates declines to the job path (no crash on empty hits)") {
    val db = new graft.api.GraftDb(spark, tmpDir("r14_rt_sparse_empty"))
    db.createTable(
      """{"name":"S","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"DOT_PRODUCT"}]}""".stripMargin)
    // no row carries dim 3: a [3]-only query has NO postings to walk, so
    // servePointDot returns Some(empty) and the floor check must decline
    val rows = (0 until 600).map { i =>
      val dims = Seq(8 + i % 4, 12 + i % 4)
      Row(i.toLong, Row(dims.distinct.sorted, dims.distinct.map(_ => 1.0f)))
    }
    db.store("S").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("SV", graft.functions.SparseVec.sqlType, nullable = false)))))
    db.rebuildIndex("S", "SV")
    // pre-fix this threw UnsupportedOperationException (Array.last on
    // empty) out of query(); now it declines and the job path answers
    // with zero-dot rows
    val resp = db.query(
      """{"table":"S","queryVector":{"indices":[3],"values":[1.0]},
        |"limit":5,"serve":true,"recallTarget":1.0,"response":["ID"]}""".stripMargin)
    assert(!resp.contains("\"served\""), resp)
    assert(resultIds(resp, "ID").size == 5, resp)
    // same shape under COSINE's unseen constant
    val respCos = db.query(
      """{"table":"S","queryVector":{"indices":[3],"values":[1.0]},
        |"limit":5,"serve":true,"recallTarget":0.5,"response":["ID"]}""".stripMargin)
    assert(resultIds(respCos, "ID").size == 5, respCos)
  }
}
