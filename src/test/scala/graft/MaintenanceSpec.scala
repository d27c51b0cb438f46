package graft

import org.apache.spark.sql.functions._
import graft.api.{GraftDb, Maintenance}
import graft.streaming.WalStream

/** R3 scheduled rebuild + S5 WAL retention + manifest retention/vacuum
  * (reference: db_server.hpp:133-142; write_ahead_log.hpp:27-28,86-89). */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ivfMeta(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/ivf_meta.json")))

  test("tick rebuilds a stale index, skips an unchanged one, prunes manifests") {
    val root = tmpDir("maint_db")
    val db = new GraftDb(spark, root)
    db.createTable(
      """{"name":"Vecs","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Vec","dataType":"VECTOR_FLOAT","dimensions":8}]}""".stripMargin)
    val st = db.store("Vecs")
    def rows(from: Long, until: Long) =
      (from until until).map(i =>
        (i, (0 until 8).map(j => ((i * 31 + j * 7) % 100).toFloat / 100f)))
        .toDF("ID", "Vec")
    st.insert(rows(0, 600))

    val maint = new Maintenance(db, retentionMs = 0L)
    val r1 = maint.tick()
    assert(r1.indexesRebuilt == 1, r1)
    val metaPath = s"$root/Vecs/ivf_Vec"
    val metaAfterBuild = ivfMeta(metaPath)
    assert(metaAfterBuild.contains("\"watermark\":600"), metaAfterBuild)

    // unchanged table -> skip (watermark AND count both match)
    val r2 = maint.tick(now = System.currentTimeMillis + 10)
    assert(r2.indexesRebuilt == 0, r2)

    // new rows move the watermark -> appended incrementally (O(new rows)),
    // NOT a full rebuild: 50/600 is inside the drift bound
    st.insert(rows(600, 650))
    val r3 = maint.tick(now = System.currentTimeMillis + 20)
    assert(r3.indexesRebuilt == 0 && r3.indexesAppended == 1, r3)
    assert(ivfMeta(metaPath).contains("\"watermark\":650"))

    // appends past the drift bound (400/600 > 50% since the full build):
    // the tick appends the tail AND the rebuild pass compacts/re-fits
    st.insert(rows(650, 1000))
    val r4 = maint.tick(now = System.currentTimeMillis + 30)
    assert(r4.indexesAppended == 1 && r4.indexesRebuilt == 1, r4)
    assert(ivfMeta(metaPath).contains("\"watermark\":1000"))

    // fresh build -> next tick is a pure no-op
    val r5 = maint.tick(now = System.currentTimeMillis + 40)
    assert(r5.indexesRebuilt == 0 && r5.indexesAppended == 0, r5)

    // retention 0 (with a future `now`) prunes all but the latest manifest
    assert(st.versions().size == 1)
    assert(st.count() == 1000)
  }

  test("tick refreshes a stale BM25 impact index and skips an unchanged one") {
    val root = tmpDir("maint_bm25")
    val db = new GraftDb(spark, root)
    db.createTable(
      """{"name":"Docs","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Doc","dataType":"STRING"}]}""".stripMargin)
    val st = db.store("Docs")
    def rows(from: Long, until: Long) =
      (from until until).map(i =>
        (i, s"spark join ${if (i % 3 == 0) "vector" else "scan"} w$i"))
        .toDF("ID", "Doc")
    st.insert(rows(0, 50))
    assert(db.rebuildBm25Index("Docs", "Doc")) // first build
    val maint = new Maintenance(db, retentionMs = Long.MaxValue)
    // unchanged -> the discovered index skips
    assert(maint.tick().indexesRebuilt == 0)
    // new docs -> the tick's discovered-bm25 pass rebuilds (fresh global
    // stats: N moved from 50 to 80)
    st.insert(rows(50, 80))
    assert(maint.tick().indexesRebuilt == 1)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/Docs/bm25_Doc/sp_meta.json")))
    assert(meta.contains("\"count\":80"), meta)
  }

  test("manifest expiry + vacuum reclaim dirs only old versions referenced") {
    val root = tmpDir("maint_vac")
    val schema = graft.types.TableSchema("T", Seq(
      graft.types.FieldSchema("ID", graft.types.FieldType.BigInt, primaryKey = true),
      graft.types.FieldSchema("V", graft.types.FieldType.Str)))
    val st = graft.store.TableStore.create(spark, root, schema)
    st.insert((1L to 100L).map(i => (i, s"v$i")).toDF("ID", "V"))
    st.insert((101L to 200L).map(i => (i, s"v$i")).toDF("ID", "V"))
    st.delete(Nil, "ID <= 50")
    st.compact() // latest manifest references ONE fresh dir
    assert(st.versions().size == 4)
    def dataDirs() = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/data")).count()
    assert(dataDirs() == 3) // 2 batch dirs + compacted

    // nothing expires inside the retention window
    assert(st.expireVersions(retainMs = 24 * 3600 * 1000L) == 0)
    // beyond retention: all but latest go; vacuum reclaims their dirs
    val removed = st.expireVersions(retainMs = 0L,
      now = System.currentTimeMillis + 1000)
    assert(removed == 3)
    // default grace spares just-written dirs (cross-process writer safety)
    st.vacuum()
    assert(dataDirs() == 3)
    st.vacuum(graceMs = 0L)
    assert(dataDirs() == 1)
    assert(st.count() == 150)
    assert(st.read().filter(col("ID") <= 50).count() == 0)
    intercept[Exception](st.readVersion(0)) // expired version is gone
  }

  test("WAL expiry deletes consumed old files, never unconsumed ones") {
    val root = tmpDir("maint_wal")
    val walDir = s"$root/wal"
    val schema = graft.types.TableSchema("W", Seq(
      graft.types.FieldSchema("ID", graft.types.FieldType.BigInt, primaryKey = true),
      graft.types.FieldSchema("V", graft.types.FieldType.Str)))
    val st = graft.store.TableStore.create(spark, s"$root/W", schema)
    WalStream.append(walDir, 1, "INSERT", payload = """{"ID":1,"V":"a"}""")
    WalStream.append(walDir, 2, "INSERT", payload = """{"ID":2,"V":"b"}""")
    WalStream.append(walDir, 3, "INSERT", payload = """{"ID":3,"V":"c"}""")
    val batch = spark.read.schema(WalStream.entrySchema).json(walDir)
    WalStream.applyBatch(st)(batch, 0L)
    assert(st.count() == 3)
    assert(WalStream.consumedGid(st) == 3)
    WalStream.append(walDir, 4, "INSERT", payload = """{"ID":4,"V":"d"}""")

    def walFiles() = java.nio.file.Files.list(
      java.nio.file.Paths.get(walDir)).count()
    assert(walFiles() == 4)
    // young files survive even when consumed
    assert(WalStream.expire(walDir, st, retentionMs = 3600 * 1000L) == 0)
    // old + consumed -> deleted; gid 4 is old but NOT consumed -> kept
    val removed = WalStream.expire(walDir, st, retentionMs = 0L,
      now = System.currentTimeMillis + 1000)
    assert(removed == 3)
    assert(walFiles() == 1)
  }
}
