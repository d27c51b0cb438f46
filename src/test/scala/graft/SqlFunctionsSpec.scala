package graft

/** SQL-registered custom expressions end-to-end through spark.sql. */
class SqlFunctionsSpec extends SparkSpec {

  test("distance functions callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  l2sqr_distance(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                 array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS l2,
        |  dot_product(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |              array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS dot,
        |  cosine_distance(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos
      """.stripMargin).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 23.0)
    assert(math.abs(r.getDouble(2)) < 1e-12)
  }

  test("SQL top-K over the embeddings table matches the DataFrame plan") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val ids = spark.sql(
      """SELECT vec_id FROM emb
        |ORDER BY l2sqr_distance(embedding,
        |  (SELECT embedding FROM emb WHERE vec_id = 0)) ASC, vec_id ASC
        |LIMIT 5""".stripMargin).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(0L, 17L, 225L, 12L, 483L))
  }

  test("l2_normalize from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head()
    assert(r.getSeq[Float](0) == Seq(0.6f, 0.8f))
  }

  test("topk_min aggregate from SQL: batch top-k via GROUP BY") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT t.vec_id AS qid, hit.id AS nid
        |FROM (
        |  SELECT q.vec_id,
        |    topk_min(l2sqr_distance(e.embedding, q.embedding),
        |             CAST(e.vec_id AS BIGINT), 3) AS topk
        |  FROM emb e JOIN (SELECT * FROM emb WHERE vec_id < 2) q
        |  GROUP BY q.vec_id) t
        |LATERAL VIEW explode(t.topk) AS hit
        |ORDER BY qid, hit.d, hit.id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 6)
    // each query's nearest id is itself (distance 0)
    assert(rows.filter(_._1 == 0L).head._2 == 0L)
    assert(rows.filter(_._1 == 1L).head._2 == 1L)
  }
}
