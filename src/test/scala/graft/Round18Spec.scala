package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Round-18 additions: the history-compaction hybrid consumer
  * ([[graft.streaming.DocStream.cleanConsumeHybrid]] — store-side
  * anti-join for the cold history + TTL-bounded checkpoint for the hot
  * window), the vacuum log-scan bound (newest `.compact` + later deltas
  * only), and interpolated modified Kneser-Ney for the per-language
  * order-n LM. */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  test("hybrid consumer == all-history consumer across TTL expiry and restarts; pure TTL diverges") {
    // Four snapshots, each a separate AvailableNow query on a shared
    // checkpoint (the restart path). The duplicate in snapshot 4 arrives
    // AFTER its digest expired from the TTL state (sleep + two
    // watermark-advancing snapshots) — the pure TTL form re-admits it,
    // the hybrid's anti-join against the accumulated outDir catches it,
    // and the all-history form is the reference.
    val docSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def fillerLine(tag: String, i: Int) =
      s"the quiet$tag$i engine hums and the long river$tag$i bends with easy grace."
    def doc(tag: String) = (0 to 4).map(i => fillerLine(tag, i)).mkString("\n")
    val snaps: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> doc("aa"), 2L -> doc("aa")), // in-batch dup: min-id wins
      Seq(3L -> doc("bb")),                  // watermark advance
      Seq(4L -> doc("cc")),                  // fires the lazy eviction
      Seq(5L -> doc("aa"), 6L -> doc("dd"))) // 5 = post-expiry duplicate
    val noWinners = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType),
        StructField("pos", org.apache.spark.sql.types.IntegerType),
        StructField("h", LongType))))
    def run(mode: String): Seq[(Long, String, Long)] = {
      val base = java.nio.file.Files.createTempDirectory(s"hybrid_$mode")
      def p(s: String) = base.resolve(s).toString
      snaps.zipWithIndex.foreach { case (snap, i) =>
        if (i == 3) Thread.sleep(3000) // let ttl=2000 lapse before snap 4
        val df = snap.toDF("doc_id", "text")
        mode match {
          case "hybrid" => graft.streaming.DocStream.cleanConsumeHybrid(
            df, noWinners, p("inbox"), p("ck"), p("out"), "text",
            "doc_id", 8, ttlMs = 2000L)
          case "ttl" => graft.streaming.DocStream.cleanConsumeIncremental(
            df, noWinners, p("inbox"), p("ck"), p("out"), "text",
            "doc_id", 8, ttlMs = 2000L)
          case "full" => graft.streaming.DocStream.cleanConsumeIncremental(
            df, noWinners, p("inbox"), p("ck"), p("out"), "text",
            "doc_id", 8, ttlMs = 0L)
        }
      }
      val out = spark.read.parquet(p("out"))
        .select("id", "clean_text", "n_final")
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
      graft.pipeline.StageCaches.unpersistAll()
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
      out
    }
    val full = run("full")
    val hybrid = run("hybrid")
    val ttlOnly = run("ttl")
    assert(full.map(_._1) == Seq(1L, 3L, 4L, 6L),
      s"all-history reference drifted: ${full.map(_._1)}")
    assert(hybrid == full,
      s"hybrid != all-history: hybrid=${hybrid.map(_._1)} full=${full.map(_._1)}")
    assert(ttlOnly.map(_._1).contains(5L),
      "fixture lost its teeth: the pure TTL form no longer re-admits, " +
        s"so the anti-join isn't being exercised: ${ttlOnly.map(_._1)}")
  }

  test("cleanConsumeHybrid rejects ttlMs <= 0") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.streaming.DocStream.cleanConsumeHybrid(df, df, "/tmp/i",
        "/tmp/c", "/tmp/o", ttlMs = 0L)
    }
  }

  test("vacuum newest-compact-only read deletes the same set a full log scan names (12-batch fixture)") {
    val inboxSchema = StructType(Seq(StructField("id", LongType),
      StructField("clean_text", StringType),
      StructField("n_final", LongType)))
    val base = java.nio.file.Files.createTempDirectory("vacuum_bound_spec")
    def p(s: String) = base.resolve(s).toString
    def pass(rows: Seq[(Long, String, Long)]): Unit = {
      rows.toDF("id", "clean_text", "n_final").coalesce(1)
        .write.mode("append").parquet(p("inbox"))
      val q = graft.streaming.DocStream.incrementalCleanDedup(
          spark.readStream.schema(inboxSchema).parquet(p("inbox")))
        .toDF()
        .writeStream.format("parquet").option("path", p("out"))
        .option("checkpointLocation", p("ck"))
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    for (i <- 1 to 12) pass(Seq((i.toLong, s"bound text $i", 3L)))
    // one more appended-but-unprocessed file: must survive either way
    Seq((99L, "pending", 1L)).toDF("id", "clean_text", "n_final")
      .coalesce(1).write.mode("append").parquet(p("inbox"))
    // reference deletion set: the UNBOUNDED scan — parse EVERY source-log
    // file (pre-compaction deltas included) with the same per-entry
    // committed-batch filter vacuumInbox applies
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val srcLog = new java.io.File(p("ck") + "/sources/0")
    assert(srcLog.listFiles().exists(_.getName.endsWith(".compact")),
      "fixture drifted: no compacted source log after 12 batches")
    val maxCommitted = new java.io.File(p("ck") + "/commits").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
    val expected = srcLog.listFiles().toSeq
      .filter(f => f.getName.takeWhile(_ != '.').forall(_.isDigit) &&
        f.getName.takeWhile(_ != '.').nonEmpty)
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()
        .filter(_.startsWith("{")).flatMap { line =>
          scala.util.Try(JsonMethods.parse(line)).toOption.flatMap { j =>
            (j \ "path", j \ "batchId") match {
              case (JString(pp), JInt(b)) if b <= maxCommitted =>
                Some(new java.net.URI(pp).getPath)
              case _ => None
            }
          }
        }.toList).distinct
      .filter(pp => new java.io.File(pp).exists())
    assert(expected.size == 12, s"reference scan drifted: $expected")
    val n = graft.streaming.DocStream.vacuumInbox(spark, p("inbox"), p("ck"))
    assert(n == expected.size,
      s"bounded vacuum deleted $n, full-scan reference names ${expected.size}")
    assert(expected.forall(pp => !new java.io.File(pp).exists()),
      "bounded vacuum missed a file the full scan names")
    assert(new java.io.File(p("inbox")).listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "the pending (unprocessed) file must survive")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }
}
