package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** NULL / missing vector fields — the insert boundary and every layer
  * behind it.
  *
  * The reference REJECTS any insert batch containing a record that misses
  * a non-index field (table_segment_mvp.cpp:465-473, INVALID_RECORD) — it
  * can never hold a null vector. The library-level DataFrame surface CAN
  * (schema-first inserts), so everything downstream must stay exact:
  * a NULL vector has NULL distance, and Spark's asc ordering is NULLS
  * FIRST — an unguarded top-k would put every null-vector row at rank 1.
  * Contract: null-vector rows are NOT in that field's search universe
  * (job path and serve path agree), and any serving path that needs a
  * COMPLETE id universe (the borrowed dense pass verdict) declines when
  * the donor skipped rows. */
class NullVectorSpec extends SparkSpec {

  private def vecOf(i: Int): Seq[Float] =
    Seq((i % 83) / 83.0f, (i % 47) / 47.0f, (i % 29) / 29.0f, (i % 13) / 13.0f)

  private val tableJson =
    """{"name":"N","fields":[
      |{"name":"ID","dataType":"BIGINT","primaryKey":true},
      |{"name":"Label","dataType":"BIGINT"},
      |{"name":"V","dataType":"VECTOR_FLOAT","dimensions":4,
      | "metricType":"EUCLIDEAN"}]}""".stripMargin

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

  // ---- the insert boundary (reference parity) ----

  test("JSON insert rejects the whole batch when a record misses a field") {
    val db = new graft.api.GraftDb(spark, tmpDir("nv_missing"))
    db.createTable(tableJson)
    val e = intercept[IllegalArgumentException] {
      db.insert(
        """{"table":"N","data":[
          |{"ID":1,"Label":1,"V":[0.1,0.2,0.3,0.4]},
          |{"ID":2,"Label":2}]}""".stripMargin)
    }
    assert(e.getMessage.contains("Record 1 missing field: V"), e.getMessage)
    // batch atomicity: the valid record 0 must NOT have been inserted
    assert(db.statistics("N") == """{"table":"N","totalRecords":0}""")
    // a missing SCALAR field rejects too (the reference checks every field)
    val e2 = intercept[IllegalArgumentException] {
      db.insert("""{"table":"N","data":[{"ID":3,"V":[0.1,0.2,0.3,0.4]}]}""")
    }
    assert(e2.getMessage.contains("Record 0 missing field: Label"), e2.getMessage)
  }

  test("JSON insert rejects an explicit null VECTOR; null scalars stay allowed") {
    val db = new graft.api.GraftDb(spark, tmpDir("nv_nullvec"))
    db.createTable(tableJson)
    val e = intercept[IllegalArgumentException] {
      db.insert("""{"table":"N","data":[{"ID":1,"Label":1,"V":null}]}""")
    }
    assert(e.getMessage.contains("Record 0 null vector field: V"), e.getMessage)
    // scalar null: allowed (SQL semantics downstream — filters fail it,
    // facets group it) — a documented extension over the reference
    val ok = db.insert(
      """{"table":"N","data":[{"ID":2,"Label":null,"V":[0.1,0.2,0.3,0.4]}]}""")
    assert(ok == """{"inserted":1,"skipped":0}""")
  }

  test("auto-embed TARGET fields are exempt from the presence check") {
    val db = new graft.api.GraftDb(spark, tmpDir("nv_embed"))
    db.createTable(
      """{"name":"Docs","fields":[
        |{"name":"ID","dataType":"INT","primaryKey":true},
        |{"name":"Body","dataType":"STRING"},
        |{"name":"Emb","dataType":"VECTOR_FLOAT","dimensions":16,"metricType":"COSINE"}],
        |"indices":[{"name":"ix","src":"Body","tgt":"Emb","model":"fake/api"}]}""".stripMargin)
    val ins = db.insert(
      """{"table":"Docs","data":[{"ID":1,"Body":"generated at ingest"}]}""")
    assert(ins == """{"inserted":1,"skipped":0}""")
  }

  // ---- the job path behind the boundary (library-level inserts) ----

  private def withNullRows(tag: String, n: Int, nullIds: Set[Int])
      : graft.api.GraftDb = {
    val db = new graft.api.GraftDb(spark, tmpDir(tag))
    db.createTable(tableJson)
    val rows = (0 until n).map { i =>
      Row(i.toLong, (i % 10).toLong, if (nullIds(i)) null else vecOf(i))
    }
    val res = db.store("N").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("Label", LongType, nullable = false),
        StructField("V", ArrayType(FloatType, containsNull = false), nullable = true)))))
    assert(res.inserted == n, res.toString)
    db
  }

  test("null-vector rows never enter a dense top-k (NULL distance must not sort first)") {
    val db = withNullRows("nv_job", 60, Set(0, 7, 13))
    val q = db.query(
      """{"table":"N","queryVector":[0.5,0.4,0.3,0.2],"limit":60,
        |"withDistance":true,"response":["ID","@distance"]}""".stripMargin)
    val ids = resultIds(q, "ID")
    assert(ids.length == 57, s"${ids.length}: $q") // 3 null rows excluded
    assert(!ids.exists(Set(0L, 7L, 13L)), q)
    assert(!q.contains("null"), s"null distance leaked: $q")
    // facets path shares the guard
    val qf = db.query(
      """{"table":"N","queryVector":[0.5,0.4,0.3,0.2],"limit":60,
        |"response":["ID"],
        |"facets":[{"group":["Label"],"aggregate":["COUNT(*)"]}]}""".stripMargin)
    assert(!resultIds(qf, "ID").exists(Set(0L, 7L, 13L)), qf)
  }

  // ---- the index + serving layers ----

  test("IVF build/append skip null vectors, advance the watermark past them, and report the incomplete universe") {
    val db = withNullRows("nv_index", 600, (0 until 600).filter(_ % 50 == 0).toSet)
    assert(db.rebuildIndex("N", "V"))
    val idx = new graft.index.IvfIndex(spark, s"${db.root}/N/ivf_V",
      graft.store.TableStore.RowId, graft.types.MetricType.Euclidean)
    assert(!idx.universeComplete(), "12 null rows must mark the universe incomplete")
    assert(idx.indexedWatermark() == 600L, "watermark must pass the null rows")
    // serving works and never returns a null row
    val served = db.query(
      """{"table":"N","queryVector":[0.5,0.4,0.3,0.2],"limit":20,"serve":true}""")
    assert(served.contains("\"served\":true"), served)
    val m = db.store("N").read()
      .select(col(graft.store.TableStore.RowId), col("ID"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resultIds(served).map(m).forall(_ % 50 != 0), served)
    // append a batch with one more null: watermark + null count advance
    val more = (600 until 650).map { i =>
      Row(i.toLong, (i % 10).toLong, if (i == 620) null else vecOf(i))
    }
    assert(db.store("N").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(more, 1), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("Label", LongType, nullable = false),
        StructField("V", ArrayType(FloatType, containsNull = false), nullable = true))))
      ).inserted == 50)
    assert(db.appendIndexes("N") == 1)
    assert(idx.indexedWatermark() == 650L, "append watermark must pass the null row")
    assert(!idx.universeComplete())
    // a serve after the append still skips every null row
    val served2 = db.query(
      """{"table":"N","queryVector":[0.5,0.4,0.3,0.2],"limit":50,"serve":true}""")
    assert(served2.contains("\"served\":true"), served2)
    val m2 = db.store("N").read()
      .select(col(graft.store.TableStore.RowId), col("ID"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resultIds(served2).map(m2).forall(id => id % 50 != 0 && id != 620L),
      served2)
  }

  test("an all-non-null build reports a complete universe") {
    val db = withNullRows("nv_complete", 600, Set.empty)
    assert(db.rebuildIndex("N", "V"))
    assert(new graft.index.IvfIndex(spark, s"${db.root}/N/ivf_V",
      graft.store.TableStore.RowId, graft.types.MetricType.Euclidean)
      .universeComplete())
  }

  test("sparse filtered serving DECLINES when the dense donor's universe is incomplete (never excludes unseen rows)") {
    val db = new graft.api.GraftDb(spark, tmpDir("nv_donor"))
    db.createTable(
      """{"name":"S","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Label","dataType":"BIGINT"},
        |{"name":"V","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"DOT_PRODUCT"}]}""".stripMargin)
    // row 11 passes the filter (Label 1), has a STRONG sparse match on the
    // query dims, but a NULL dense vector: a borrowed dense verdict that
    // silently judged it non-passing would drop it from a served answer
    val rows = (0 until 600).map { i =>
      val (a, b) = (i % 16, (i + 7) % 16)
      val sv = Row(Seq(math.min(a, b), math.max(a, b)),
        Seq(if (i == 11) 9.0f else 1.0f + (i % 5) * 0.25f, 0.5f))
      Row(i.toLong, (i % 10).toLong, if (i == 11) null else vecOf(i), sv)
    }
    assert(db.store("S").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType(Seq(
        StructField("ID", LongType, nullable = false),
        StructField("Label", LongType, nullable = false),
        StructField("V", ArrayType(FloatType, containsNull = false), nullable = true),
        StructField("SV", graft.functions.SparseVec.sqlType, nullable = false)))))
      .inserted == 600)
    assert(db.rebuildIndex("S", "V"))
    assert(db.rebuildIndex("S", "SV"))
    db.setServeFilterColumns("S", "V", Seq("Label"))
    // row 11's dims: a=11, b=2 -> sorted (2, 11); query those dims
    val qv = """{"indices":[2,11],"values":[1.0,1.0]}"""
    val served = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label = 1"}""".stripMargin)
    assert(!served.contains("\"served\""),
      s"incomplete donor must decline filtered sparse serving: $served")
    // and the job path (which answered) must rank the null-dense row 11 first
    val job = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"filter":"Label = 1","response":["ID"]}""".stripMargin)
    assert(resultIds(job, "ID").head == 11L, job)
  }

  test("a null-dense row in the FRESH TAIL declines the borrowed verdict (complete-universe rule above the pin too)") {
    val db = new graft.api.GraftDb(spark, tmpDir("nv_tail"))
    db.createTable(
      """{"name":"S","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Label","dataType":"BIGINT"},
        |{"name":"V","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":16,
        | "metricType":"DOT_PRODUCT"}]}""".stripMargin)
    def svOf(i: Int, v: Float) = {
      val (a, b) = (i % 16, (i + 7) % 16)
      Row(Seq(math.min(a, b), math.max(a, b)), Seq(v, 0.5f))
    }
    val schema = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("Label", LongType, nullable = false),
      StructField("V", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("SV", graft.functions.SparseVec.sqlType, nullable = false)))
    val rows = (0 until 600).map(i =>
      Row(i.toLong, (i % 10).toLong, vecOf(i), svOf(i, 1.0f + (i % 5) * 0.25f)))
    assert(db.store("S").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)).inserted == 600)
    assert(db.rebuildIndex("S", "V"))
    assert(db.rebuildIndex("S", "SV"))
    db.setServeFilterColumns("S", "V", Seq("Label"))
    val qv = """{"indices":[3,10],"values":[1.0,1.0]}"""
    // baseline: complete donor -> sparse filtered request SERVES
    val before = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label >= 5"}""".stripMargin)
    assert(before.contains("\"served\":true"), before)
    // a store-direct insert above the pin with a NULL dense vector (the
    // JSON surface rejects it; the DataFrame surface is schema-first)
    assert(db.store("S").insert(spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(600L, 5L, null, svOf(600, 9.0f))), 1), schema)).inserted == 1)
    val after = db.query(
      s"""{"table":"S","queryField":"SV","queryVector":$qv,"limit":5,
         |"serve":true,"filter":"Label >= 5"}""".stripMargin)
    assert(!after.contains("\"served\""),
      s"null-dense tail row must decline the borrowed verdict: $after")
    // the job path answered (default projection, no __row_id)
    assert(resultIds(after, "ID").nonEmpty, after)
  }
}
