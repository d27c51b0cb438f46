package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Hybrid (dense + BM25 keyword) retrieval through the JSON API. */
class HybridSpec extends SparkSpec {

  // 600 docs (past MinimalIndexSize) with a deterministic mixed vocab so
  // both the dense index and the BM25 impact index are non-trivial
  private val vocab = Array("spark", "vector", "join", "scan", "stream",
    "filter", "hash", "probe", "window", "state", "plan", "fusion")
  private val docsText: Seq[String] = (0 until 600).map { i =>
    val len = 4 + (i * 7) % 9
    (0 until len).map(j => vocab((i * 5 + j * j) % vocab.length)).mkString(" ")
  }

  private def hybridDb(dir: String): graft.api.GraftDb = {
    val db = new graft.api.GraftDb(spark, tmpDir(dir))
    db.createTable(
      """{"name":"H","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Doc","dataType":"STRING"},
        |{"name":"V","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    val rows = docsText.zipWithIndex.map { case (t, i) =>
      Row((i + 1).toLong, t,
        Seq((i % 83) / 83.0f, (i % 47) / 47.0f, (i % 29) / 29.0f, (i % 13) / 13.0f))
    }
    db.store("H").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("Doc", StringType, nullable = false),
        StructField("V", ArrayType(FloatType, containsNull = false), nullable = false)))))
    db
  }

  private def fusedIds(resp: String): Seq[Long] = {
    val j = JsonMethods.parse(resp)
    (j \ "result") match {
      case JArray(rows) => rows.map(r => (r \ "__row_id") match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case other => fail(s"bad __row_id $other")
      })
      case other => fail(s"no result array in $resp; got $other")
    }
  }

  /** Reference RRF over the two sides computed independently of the API. */
  private def expectedFusion(db: graft.api.GraftDb, vec: Seq[Double],
      terms: Seq[String], cut: Int, limit: Int): Seq[Long] = {
    import org.apache.spark.sql.functions._
    val st = db.store("H")
    val dense = st.read()
      .withColumn("d", graft.functions.l2sqr_distance(col("V"),
        lit(vec.map(_.toFloat).toArray)))
      .orderBy(col("d").asc, col(graft.store.TableStore.RowId).asc)
      .limit(cut).select(graft.store.TableStore.RowId)
      .collect().map(_.getLong(0))
    val postings = graft.pipeline.Bm25.impactPostings(st.read(), "Doc",
      graft.store.TableStore.RowId)
    val qd = graft.pipeline.Bm25.queryDims(terms)
    val kw = postings.filter(col("dim").isin(qd.map(Integer.valueOf): _*))
      .groupBy(col("id")).agg(sum(col("v").cast("double")).as("s"))
      .orderBy(col("s").desc, col("id").asc).limit(cut)
      .collect().map(_.getLong(0))
    val rrf = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
    dense.zipWithIndex.foreach { case (id, i) => rrf(id) += 1.0 / (60.0 + i + 1) }
    kw.zipWithIndex.foreach { case (id, i) => rrf(id) += 1.0 / (60.0 + i + 1) }
    rrf.toSeq.sortBy { case (id, s) => (-s, id) }.take(limit).map(_._1)
  }

  test("hybrid endpoint fuses dense and keyword rankings by RRF (job paths)") {
    val db = hybridDb("hy_job")
    assert(db.rebuildBm25Index("H", "Doc"))
    val vec = Seq(0.4, 0.33, 0.4, 0.5)
    val resp = db.query(
      s"""{"table":"H","queryField":"V","textField":"Doc",
         |"queryVector":[${vec.mkString(",")}],
         |"keywords":["spark","vector","join"],"limit":6}""".stripMargin)
    assert(resp.contains("\"hybrid\":true"), resp)
    assert(fusedIds(resp) ==
      expectedFusion(db, vec, Seq("spark", "vector", "join"), 50, 6), resp)
  }

  test("hybrid with serve:true answers both sides from the resident tiers") {
    val db = hybridDb("hy_serve")
    assert(db.rebuildBm25Index("H", "Doc"))
    assert(db.rebuildIndex("H", "V"))
    val vec = Seq(0.4, 0.33, 0.4, 0.5)
    def q(): String = db.query(
      s"""{"table":"H","queryField":"V","textField":"Doc",
         |"queryVector":[${vec.mkString(",")}],
         |"keywords":["spark","vector","join"],"limit":6,"serve":true}""".stripMargin)
    val resp = q()
    // the tiny fixture serves on both sides; results equal the job fusion
    // (tombstone masking through each serving side is covered by that
    // side's own suites; the frozen-impact caveat makes a post-delete
    // keyword comparison against live-recomputed impacts ill-posed)
    assert(resp.contains("\"served\":{\"dense\":true,\"keyword\":true}"), resp)
    assert(fusedIds(resp) ==
      expectedFusion(db, vec, Seq("spark", "vector", "join"), 50, 6), resp)
  }
}
