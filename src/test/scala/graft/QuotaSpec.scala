package graft

import graft.api.GraftCatalog

/** Per-database admission quotas (our multi-tenant extension over the
  * reference's quota-less catalog): table-count cap at createTable, rows
  * cap at the JSON insert surface, both persisted with the catalog. */
class QuotaSpec extends SparkSpec {

  val tableJson =
    """{"name":"T","fields":[
      |{"name":"ID","dataType":"BIGINT","primaryKey":true},
      |{"name":"V","dataType":"STRING"}]}""".stripMargin
  val table2Json = tableJson.replace("\"T\"", "\"T2\"")
  val table3Json = tableJson.replace("\"T\"", "\"T3\"")

  test("table-count quota blocks createTable past the cap") {
    val cat = new GraftCatalog(spark, tmpDir("quota"))
    val db = cat.load("capped")
    cat.setQuota("capped", maxTables = 2)
    db.createTable(tableJson)
    db.createTable(table2Json)
    val e = intercept[IllegalStateException](db.createTable(table3Json))
    assert(e.getMessage.contains("table quota"))
    // raising the quota unblocks
    cat.setQuota("capped", maxTables = 3)
    db.createTable(table3Json)
    assert(db.listTables().size == 3)
  }

  test("row quota bounds the JSON insert surface and survives reload") {
    val root = tmpDir("quota2")
    val cat = new GraftCatalog(spark, root)
    val db = cat.load("rows")
    db.createTable(tableJson)
    cat.setQuota("rows", maxRowsPerTable = 3L)
    db.insert("""{"table":"T","data":[{"ID":1,"V":"a"},{"ID":2,"V":"b"}]}""")
    val e = intercept[IllegalStateException](
      db.insert("""{"table":"T","data":[{"ID":3,"V":"c"},{"ID":4,"V":"d"}]}"""))
    assert(e.getMessage.contains("row quota"))
    // still room for one
    db.insert("""{"table":"T","data":[{"ID":3,"V":"c"}]}""")
    assert(db.store("T").count() == 3)

    // a fresh catalog instance re-applies the persisted quota
    val cat2 = new GraftCatalog(spark, root)
    val db2 = cat2.db("rows")
    val e2 = intercept[IllegalStateException](
      db2.insert("""{"table":"T","data":[{"ID":9,"V":"z"}]}"""))
    assert(e2.getMessage.contains("row quota"))
  }

  test("unset quota means unlimited") {
    val cat = new GraftCatalog(spark, tmpDir("quota3"))
    val db = cat.load("free")
    db.createTable(tableJson)
    db.createTable(table2Json)
    db.insert("""{"table":"T","data":[{"ID":1,"V":"a"}]}""")
    assert(db.store("T").count() == 1)
  }
}
