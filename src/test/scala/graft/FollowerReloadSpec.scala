package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.functions.SparseVec
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Multi-process follower reload (reference: leader/follower replicas
  * share state via files on disk, table_mvp.cpp:143-170;
  * db_server.hpp:104-110): a SECOND JVM (`graft.FollowerProbe`) opens the
  * same root, serves, and must pick up this JVM's later inserts +
  * append/rebuild through the on-disk meta stamps alone — no reopen, no
  * message passing. Dense direction exercises the APPEND path (watermark
  * moves, residency stays pinned, fresh rows ride the tail); sparse
  * exercises the FULL REBUILD path (gen bump flushes the follower's
  * resident postings). */
class FollowerReloadSpec extends SparkSpec {

  private def javaBin = s"${System.getProperty("java.home")}/bin/java"

  // mirror build.sbt's JDK-17 module opens (the forked test JVM got them
  // from sbt; the grand-child must get them explicitly)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawnFollower(root: String, mode: String): Process = {
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.FollowerProbe", root, mode)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(java.io.File.createTempFile("follower", ".log"))
    pb.start()
  }

  private def await(path: java.nio.file.Path, timeoutMs: Long = 120000): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!java.nio.file.Files.exists(path)) {
      assert(System.currentTimeMillis < deadline, s"timed out waiting for $path")
      Thread.sleep(100)
    }
  }

  private def servedIds(json: String): (Boolean, Seq[Long]) = {
    val parsed = JsonMethods.parse(json)
    val served = (parsed \ "served") == JBool(true)
    val ids = (parsed \ "result").asInstanceOf[JArray].arr.map(r =>
      (r \ "__row_id") match {
        case JInt(i) => i.toLong
        case _ => fail(s"no __row_id in $json")
      })
    (served, ids)
  }

  test("dense: follower JVM picks up this process's insert + index append (no reopen)") {
    val root = tmpDir("follower_dense")
    val db = new graft.api.GraftDb(spark, root)
    db.createTable(
      """{"name":"T","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"Vec","dataType":"VECTOR_FLOAT","dimensions":4,
        | "metricType":"EUCLIDEAN"}]}""".stripMargin)
    val st = db.store("T")
    val schema = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("Vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    // every vector strictly away from the origin: the later fresh row AT
    // the origin must become the follower's new top-1
    val rows = (1 to 600).map(i =>
      Row(i.toLong, Seq(1f + (i % 50) * 0.1f, 0f, 0f, 0f)))
    st.insert(spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema))
    assert(db.rebuildIndex("T", "Vec"))

    val probe = java.nio.file.Paths.get(root, ".probe")
    val proc = spawnFollower(root, "dense")
    try {
      await(probe.resolve("phase1.done"))
      val (served1, ids1) = servedIds(new String(
        java.nio.file.Files.readAllBytes(probe.resolve("phase1.json"))))
      assert(served1, "follower phase 1 must serve from the shared index")
      // smallest-norm rows: ids with i%50 == 0 come first (vector 1.0)
      assert(ids1.size == 5 && !ids1.contains(601L))

      // leader mutates: fresh row at the origin, then ingest-time append
      st.insert(spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Row(9999L, Seq(0f, 0f, 0f, 0f))), 1), schema))
      assert(db.appendIndexes("T") == 1, "dense index must append the fresh row")
      java.nio.file.Files.write(probe.resolve("phase2.go"), Array.empty[Byte])

      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "follower never exited")
      assert(proc.exitValue == 0, s"follower failed (exit ${proc.exitValue})")
      val (served2, ids2) = servedIds(new String(
        java.nio.file.Files.readAllBytes(probe.resolve("phase2.json"))))
      assert(served2, "follower phase 2 must still serve")
      // __row_id 601 is the appended row (1-based insertion order);
      // distance 0 puts it at rank 1
      assert(ids2.head == 601L,
        s"follower did not pick up the cross-process append: $ids2")
    } finally proc.destroyForcibly()
  }

  test("sparse: follower JVM picks up this process's insert + FULL REBUILD (gen bump)") {
    val root = tmpDir("follower_sparse")
    val db = new graft.api.GraftDb(spark, root)
    db.createTable(
      """{"name":"T","fields":[
        |{"name":"ID","dataType":"BIGINT","primaryKey":true},
        |{"name":"SV","dataType":"SPARSE_VECTOR_FLOAT","dimensions":64,
        | "metricType":"DOT_PRODUCT"}]}""".stripMargin)
    val st = db.store("T")
    val schema = StructType(Seq(
      StructField("ID", LongType, nullable = false),
      StructField("SV", SparseVec.sqlType, nullable = true)))
    val rows = (1 to 200).map(i =>
      Row(i.toLong, Row(Seq(3, 15, 30 + (i % 17)),
        Seq((i % 5 + 1).toFloat, (i % 3 + 0.5f), 1.0f))))
    st.insert(spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema))
    assert(db.rebuildIndex("T", "SV"))

    val probe = java.nio.file.Paths.get(root, ".probe")
    val proc = spawnFollower(root, "sparse")
    try {
      await(probe.resolve("phase1.done"))
      val (served1, ids1) = servedIds(new String(
        java.nio.file.Files.readAllBytes(probe.resolve("phase1.json"))))
      assert(served1 && ids1.size == 5 && !ids1.contains(201L))

      // leader mutates: a dominating fresh row, then a FULL rebuild (gen
      // bump — the follower's resident postings must flush and reload)
      st.insert(spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Row(8888L, Row(Seq(3, 15), Seq(100f, 100f)))), 1), schema))
      assert(db.rebuildIndex("T", "SV"), "rebuild must actually run")
      java.nio.file.Files.write(probe.resolve("phase2.go"), Array.empty[Byte])

      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "follower never exited")
      assert(proc.exitValue == 0, s"follower failed (exit ${proc.exitValue})")
      val (served2, ids2) = servedIds(new String(
        java.nio.file.Files.readAllBytes(probe.resolve("phase2.json"))))
      assert(served2, "follower phase 2 must still serve")
      assert(ids2.head == 201L,
        s"follower did not pick up the cross-process rebuild: $ids2")
    } finally proc.destroyForcibly()
  }
}
