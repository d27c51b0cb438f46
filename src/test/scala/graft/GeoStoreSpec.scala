package graft

import org.apache.spark.sql.Row
import graft.types._
import graft.store.TableStore
import graft.query.QueryEngine
import graft.query.QueryEngine.GetRequest

/** GEO_POINT fields end-to-end: storage struct<latitude,longitude>,
  * NEARBY in the filter language, and F4 multi-batch row-id continuity. */
class GeoStoreSpec extends SparkSpec {

  def schema = TableSchema("Places", Seq(
    FieldSchema("ID", FieldType.Int4, primaryKey = true),
    FieldSchema("Name", FieldType.Str),
    FieldSchema("Loc", FieldType.GeoPoint)))

  test("GEO_POINT storage + NEARBY filter (P9/A3)") {
    val store = TableStore.create(spark, tmpDir("geo_store"), schema)
    val rows = Seq(
      Row(1, "berlin", Row(52.52, 13.405)),
      Row(2, "paris", Row(48.8566, 2.3522)),
      Row(3, "sydney", Row(-33.8688, 151.2093)),
      Row(4, "potsdam", Row(52.3906, 13.0645)))
    store.insert(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema.structType))
    // 50 km around Berlin: berlin + potsdam
    val near = QueryEngine.get(store.read(), schema,
      GetRequest(filter = "NEARBY(Loc, 52.52, 13.405, 50)"))
    assert(near.collect().map(_.getAs[String]("Name")).toSeq == Seq("berlin", "potsdam"))
    // geo struct projects as {latitude, longitude}
    val proj = QueryEngine.get(store.read(), schema,
      GetRequest(primaryKeys = Seq(3), outputFields = Seq("Name", "Loc")))
    val loc = proj.head().getStruct(1)
    assert(loc.getDouble(0) == -33.8688 && loc.getDouble(1) == 151.2093)
  }

  test("JSON fields store as strings and filter via json functions") {
    val s2 = TableSchema("JsonTable", Seq(
      FieldSchema("ID", FieldType.Int4, primaryKey = true),
      FieldSchema("Meta", FieldType.Json)))
    val store = TableStore.create(spark, tmpDir("json_store"), s2)
    import spark.implicits._
    store.insert(Seq(
      (1, """{"tag":"a","n":5}"""),
      (2, """{"tag":"b","n":10}""")).toDF("ID", "Meta"))
    val got = store.read()
      .withColumn("n", org.apache.spark.sql.functions.get_json_object(
        org.apache.spark.sql.functions.col("Meta"), "$.n").cast("int"))
      .filter("n > 7").select("ID").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2))
  }

  test("snapshot isolation: versions, time travel, compaction, vacuum") {
    val s2 = TableSchema("Versioned", Seq(
      FieldSchema("ID", FieldType.Int4, primaryKey = true),
      FieldSchema("V", FieldType.Str)))
    val store = TableStore.create(spark, tmpDir("versioned"), s2)
    import spark.implicits._
    store.insert(Seq((1, "a"), (2, "b")).toDF("ID", "V"))          // v0
    val v0 = store.snapshot().get.version
    val frozen = store.readVersion(v0) // hold a reader on v0
    store.insert(Seq((3, "c")).toDF("ID", "V"))                    // v1
    store.delete(pks = Seq(1))                                     // v2
    assert(store.read().select("ID").collect().map(_.getInt(0)).toSet == Set(2, 3))
    // the old reader still sees the v0 world
    assert(frozen.select("ID").collect().map(_.getInt(0)).toSet == Set(1, 2))
    assert(store.readVersion(v0 + 1).count() == 3)
    // compact folds tombstones; vacuum drops unreferenced dirs; data intact
    store.compact()
    store.vacuum()
    assert(store.read().select("ID").collect().map(_.getInt(0)).toSet == Set(2, 3))
    // new inserts continue the watermark after compaction
    val r = store.insert(Seq((4, "d")).toDF("ID", "V"))
    assert(r.inserted == 1)
    assert(store.read().count() == 3)
  }

  test("multi-batch inserts continue row ids; pagination spans batches (F4)") {
    val s2 = TableSchema("Batches", Seq(
      FieldSchema("ID", FieldType.Int4, primaryKey = true),
      FieldSchema("V", FieldType.Str)))
    val store = TableStore.create(spark, tmpDir("multibatch"), s2)
    (0 until 3).foreach { b =>
      val rows = (0 until 100).map(i => Row(b * 100 + i, s"v$b-$i"))
      val r = store.insert(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), s2.structType))
      assert(r.inserted == 100 && r.skipped == 0)
    }
    assert(store.count() == 300)
    // row ids are contiguous insertion order across batches
    val ids = store.read().select(TableStore.RowId).orderBy(TableStore.RowId)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (1L to 300L))
    // a page crossing the batch boundary reads in insertion order
    val page = QueryEngine.get(store.read(), s2, GetRequest(skip = 95, limit = 10))
    assert(page.collect().map(_.getAs[Int]("ID")).toSeq == (95 until 105))
    // duplicate PKs across batches are skipped (first wins across batches)
    val dup = store.insert(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0, "dup"), Row(999, "new")), 1),
      s2.structType))
    assert(dup.inserted == 1 && dup.skipped == 1)
  }
}
