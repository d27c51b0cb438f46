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
