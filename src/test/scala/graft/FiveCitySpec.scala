package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.types._
import graft.store.TableStore
import graft.query.QueryEngine
import graft.query.QueryEngine._

/** F1/F2 golden fixtures from the reference's own test suite
  * (reference: engine/test/engine/db/db_server.cpp:103-512, goldens :289-292).
  */
class FiveCitySpec extends SparkSpec {

  val cities = Seq(
    (1, "Berlin", Array(0.05f, 0.61f, 0.76f, 0.74f)),
    (2, "London", Array(0.19f, 0.81f, 0.75f, 0.11f)),
    (3, "Moscow", Array(0.36f, 0.55f, 0.47f, 0.94f)),
    (4, "San Francisco", Array(0.18f, 0.01f, 0.85f, 0.80f)),
    (5, "Shanghai", Array(0.24f, 0.18f, 0.22f, 0.44f)),
    (1, "Berlin", Array(0.05f, 0.61f, 0.76f, 0.74f))) // dup PK -> skipped

  val queryVec = Array(0.35f, 0.55f, 0.47f, 0.94f)

  def denseSchema = TableSchema("MyTable", Seq(
    FieldSchema("ID", FieldType.Int4, primaryKey = true),
    FieldSchema("Doc", FieldType.Str),
    FieldSchema("EmbeddingEuclidean", FieldType.VectorFloat, dimensions = 4, metric = MetricType.Euclidean),
    FieldSchema("EmbeddingDotProduct", FieldType.VectorFloat, dimensions = 4, metric = MetricType.DotProduct),
    FieldSchema("EmbeddingCosine", FieldType.VectorFloat, dimensions = 4, metric = MetricType.Cosine)))

  def makeDenseStore(): TableStore = {
    val store = TableStore.create(spark, tmpDir("fivecity"), denseSchema)
    val rows = cities.map { case (id, doc, v) => Row(id, doc, v.toSeq, v.toSeq, v.toSeq) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), denseSchema.structType)
    val res = store.insert(df)
    assert(res.inserted == 5 && res.skipped == 1, s"got $res")
    store
  }

  lazy val denseStore = makeDenseStore()

  def searchOrder(store: TableStore, fieldName: String, q: QueryVector = DenseQuery(queryVec),
      filter: String = "", limit: Int = 6): Seq[String] = {
    val out = QueryEngine.search(store.read(), store.schema,
      SearchRequest(fieldName, q, limit, filter, Seq("Doc"), withDistance = true))
    out.collect().map(_.getString(0)).toSeq
  }

  test("euclidean golden order") {
    assert(searchOrder(denseStore, "EmbeddingEuclidean") ==
      Seq("Moscow", "Berlin", "Shanghai", "San Francisco", "London"))
  }
  test("dot-product golden order") {
    assert(searchOrder(denseStore, "EmbeddingDotProduct") ==
      Seq("Moscow", "Berlin", "San Francisco", "London", "Shanghai"))
  }
  test("cosine golden order") {
    assert(searchOrder(denseStore, "EmbeddingCosine") ==
      Seq("Moscow", "Shanghai", "Berlin", "San Francisco", "London"))
  }
  test("filter ID <= 2 (DenseVectorFilter)") {
    assert(searchOrder(denseStore, "EmbeddingEuclidean", filter = "ID <= 2") ==
      Seq("Berlin", "London"))
  }
  test("delete by PK then re-query leaves Shanghai (DeleteByPK)") {
    val store = makeDenseStore()
    val d = store.delete(pks = Seq(1, 2, 3, 4))
    assert(d.deleted == 4)
    assert(searchOrder(store, "EmbeddingEuclidean") == Seq("Shanghai"))
  }
  test("upsert is last-wins; insert is first-wins") {
    val store = makeDenseStore()
    val v = Array(9f, 9f, 9f, 9f).toSeq
    val up = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(5, "Shanghai2", v, v, v), Row(5, "Shanghai3", v, v, v)), 1),
      denseSchema.structType)
    val r = store.insert(up, upsert = true)
    assert(r.inserted == 1 && r.skipped == 1) // in-batch last wins
    val docs = store.read().select("Doc").collect().map(_.getString(0)).toSet
    assert(docs.contains("Shanghai3") && !docs.contains("Shanghai") && !docs.contains("Shanghai2"))
  }

  // ---- sparse twin (F2) ----
  def sparseSchema = TableSchema("MySparse", Seq(
    FieldSchema("ID", FieldType.Int4, primaryKey = true),
    FieldSchema("Doc", FieldType.Str),
    FieldSchema("EmbEuclidean", FieldType.SparseVectorFloat, dimensions = 4, metric = MetricType.Euclidean),
    FieldSchema("EmbDot", FieldType.SparseVectorFloat, dimensions = 4, metric = MetricType.DotProduct),
    FieldSchema("EmbCosine", FieldType.SparseVectorFloat, dimensions = 4, metric = MetricType.Cosine)))

  lazy val sparseStore: TableStore = {
    val store = TableStore.create(spark, tmpDir("fivecity_sparse"), sparseSchema)
    val rows = cities.map { case (id, doc, v) =>
      val sv = Row(Seq(0, 1, 2, 3), v.toSeq)
      Row(id, doc, sv, sv, sv)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sparseSchema.structType)
    val res = store.insert(df)
    assert(res.inserted == 5 && res.skipped == 1, s"got $res")
    store
  }
  def sparseQ = SparseQuery(Array(0, 1, 2, 3), queryVec)

  test("sparse euclidean golden order") {
    assert(searchOrder(sparseStore, "EmbEuclidean", sparseQ) ==
      Seq("Moscow", "Berlin", "Shanghai", "San Francisco", "London"))
  }
  test("sparse dot golden order") {
    assert(searchOrder(sparseStore, "EmbDot", sparseQ) ==
      Seq("Moscow", "Berlin", "San Francisco", "London", "Shanghai"))
  }
  test("sparse cosine golden order") {
    assert(searchOrder(sparseStore, "EmbCosine", sparseQ) ==
      Seq("Moscow", "Shanghai", "Berlin", "San Francisco", "London"))
  }
  test("cross-type query errors") {
    intercept[IllegalArgumentException] {
      searchOrder(sparseStore, "EmbEuclidean", DenseQuery(queryVec))
    }
    intercept[IllegalArgumentException] {
      searchOrder(denseStore, "EmbeddingEuclidean", sparseQ)
    }
  }
  test("invalid sparse vectors are skipped with counts (InvalidSparseVector)") {
    val store = TableStore.create(spark, tmpDir("sparse_invalid"), sparseSchema)
    def sv(idx: Seq[Int], v: Seq[Float]) = Row(idx, v)
    val good = sv(Seq(0, 1), Seq(1f, 2f))
    val rows = Seq(
      Row(1, "ok", good, good, good),
      Row(2, "len-mismatch", sv(Seq(0, 1), Seq(1f)), good, good),
      Row(3, "negative", sv(Seq(-1, 1), Seq(1f, 2f)), good, good),
      Row(4, "non-increasing", sv(Seq(1, 1), Seq(1f, 2f)), good, good),
      Row(5, "out-of-range", sv(Seq(0, 4), Seq(1f, 2f)), good, good))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sparseSchema.structType)
    val res = store.insert(df)
    assert(res.inserted == 1 && res.skipped == 4, s"got $res")
  }

  test("facets aggregate the post-limit result (G1-G6)") {
    val (out, facets, _) = QueryEngine.searchWithFacets(denseStore.read(), denseStore.schema,
      SearchRequest("EmbeddingEuclidean", DenseQuery(queryVec), 3, "",
        Seq("Doc"), withDistance = true,
        facets = Seq(Facet(Seq.empty, Seq("SUM(ID)", "COUNT(*)", "MIN(ID)", "MAX(ID)")))))
    assert(out.collect().length == 3)
    val f = facets.head.collect().head
    // top-3: Moscow(3), Berlin(1), Shanghai(5) => sum 9, count 3, min 1, max 5
    assert(f.getLong(0) == 9L && f.getLong(1) == 3L && f.getInt(2) == 1 && f.getInt(3) == 5)
  }

  test("@distance usable in facet group and aggregate expressions (F8)") {
    val (_, facets, _) = QueryEngine.searchWithFacets(denseStore.read(), denseStore.schema,
      SearchRequest("EmbeddingEuclidean", DenseQuery(queryVec), 3, "",
        Seq("Doc"), withDistance = true,
        facets = Seq(
          Facet(Seq.empty, Seq("MIN(@distance)", "MAX(@distance)")),
          Facet(Seq("@distance < 0.2"), Seq("COUNT(*)")))))
    val g = facets.head.collect().head
    assert(g.getDouble(0) >= 0.0 && g.getDouble(1) >= g.getDouble(0))
    val byNear = facets(1).collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byNear.values.sum == 3)
  }

  test("multi-vector-field dispatch requires explicit queryField (V10)") {
    val db = new graft.api.GraftDb(spark, tmpDir("v10db"))
    db.createTable(graft.store.SchemaJson.write(denseSchema))
    intercept[IllegalArgumentException] {
      db.query("""{"table":"MyTable","queryVector":[0.1,0.2,0.3,0.4],"limit":1}""")
    }
  }

  test("get: skip/limit pagination in insertion order (A1/A2)") {
    val page = QueryEngine.get(denseStore.read(), denseStore.schema,
      GetRequest(filter = "ID <> 3", skip = 1, limit = 2))
    assert(page.collect().map(_.getAs[String]("Doc")).toSeq == Seq("London", "San Francisco"))
    val byPk = QueryEngine.get(denseStore.read(), denseStore.schema,
      GetRequest(primaryKeys = Seq(2, 4)))
    assert(byPk.collect().map(_.getAs[String]("Doc")).toSeq == Seq("London", "San Francisco"))
  }

  test("insertPrepare bitmask (D4)") {
    val (n, mask) = denseStore.insertPrepare(Seq(1, 99, 3))
    assert(n == 5)
    // bit cleared <=> pk exists: pk 1 exists (bit0=0), 99 not (bit1=1), 3 exists (bit2=0)
    assert((mask(0) & 1) == 0 && (mask(0) & 2) == 2 && (mask(0) & 4) == 0)
  }
}
