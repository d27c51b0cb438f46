package graft

import org.apache.spark.sql.SparkSession

/** Cross-process follower probe (reference: leader/follower replicas share
  * table + index state through files on disk — the follower reloads the
  * saved index when the leader rebuilds, table_mvp.cpp:143-170,
  * db_server.hpp:104-110). Spawned as a SECOND JVM by FollowerReloadSpec
  * against a root the test JVM (the leader) keeps mutating: proves the
  * meta-stamp re-read discipline (IvfIndex/SparseIndex `refreshIfStale`,
  * TableStore's latest-manifest resolution) picks up appends and rebuilds
  * made by ANOTHER PROCESS without reopening any handle.
  *
  * Protocol (file-based, under `$root/.probe/`):
  *   1. serve the query, write the response to phase1.json, touch
  *      phase1.done;
  *   2. poll for phase2.go (the leader has inserted + appended/rebuilt);
  *   3. re-serve THROUGH THE SAME GraftDb instance, write phase2.json,
  *      exit 0.
  */
object FollowerProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val mode = args(1) // "dense" | "sparse"
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-follower")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val db = new graft.api.GraftDb(spark, root)
      val q =
        if (mode == "sparse")
          """{"table":"T","queryVector":{"indices":[3,15],"values":[1.0,1.0]},"limit":5,"serve":true}"""
        else
          """{"table":"T","queryVector":[0,0,0,0],"limit":5,"serve":true}"""
      val probeDir = java.nio.file.Paths.get(root, ".probe")
      java.nio.file.Files.createDirectories(probeDir)
      def write(name: String, s: String): Unit = {
        // write-then-move so the leader never reads a half-written file
        val tmp = probeDir.resolve(s"$name.tmp")
        java.nio.file.Files.write(tmp, s.getBytes)
        java.nio.file.Files.move(tmp, probeDir.resolve(name),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      write("phase1.json", db.query(q))
      write("phase1.done", "")
      val deadline = System.currentTimeMillis + 120000
      while (!java.nio.file.Files.exists(probeDir.resolve("phase2.go")) &&
          System.currentTimeMillis < deadline)
        Thread.sleep(100)
      require(java.nio.file.Files.exists(probeDir.resolve("phase2.go")),
        "leader never signaled phase 2")
      // serving freshness is time-gated (IvfIndex.ServeFreshnessMs): give
      // the stamp re-read window a beat before the decisive query
      Thread.sleep(400)
      write("phase2.json", db.query(q))
    } finally spark.stop()
  }
}
