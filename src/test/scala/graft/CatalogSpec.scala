package graft

import graft.api.{GraftCatalog, GraftDb}

/** Multi-database namespace: load/unload/drop + catalog persistence
  * (reference: meta_types.hpp:85-90, basic_meta_impl.cpp:35-98). */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  val tableJson =
    """{"name":"T","fields":[
      |{"name":"ID","dataType":"BIGINT","primaryKey":true},
      |{"name":"V","dataType":"STRING"}]}""".stripMargin

  test("databases are isolated namespaces; catalog survives restart") {
    val root = tmpDir("catalog")
    val cat = new GraftCatalog(spark, root)
    val a = cat.load("alpha")
    val b = cat.load("beta")
    a.createTable(tableJson)
    b.createTable(tableJson)
    a.store("T").insert(Seq((1L, "in-alpha")).toDF("ID", "V"))
    b.store("T").insert(Seq((1L, "in-beta"), (2L, "also-beta")).toDF("ID", "V"))
    assert(a.store("T").count() == 1)
    assert(b.store("T").count() == 2)
    assert(cat.list() == Seq("alpha", "beta"))

    // a new catalog instance over the same root reloads both databases
    val cat2 = new GraftCatalog(spark, root)
    assert(cat2.list() == Seq("alpha", "beta"))
    assert(cat2.db("beta").store("T").count() == 2)
  }

  test("unload keeps files, drop deletes them") {
    val root = tmpDir("catalog2")
    val cat = new GraftCatalog(spark, root)
    val a = cat.load("keepme")
    a.createTable(tableJson)
    a.store("T").insert(Seq((1L, "x")).toDF("ID", "V"))
    val path = a.root
    assert(cat.unload("keepme"))
    assert(!cat.unload("keepme")) // already gone from the namespace
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/T/schema.json")))
    // reload by path: data still there
    assert(cat.load("keepme", path).store("T").count() == 1)

    cat.drop("keepme")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    assert(cat.list().isEmpty)
    intercept[IllegalArgumentException](cat.db("keepme"))
  }
}
