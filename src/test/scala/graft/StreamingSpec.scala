package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.types._
import graft.store.TableStore
import graft.streaming.{EventStream, WalStream}

/** S5/D6: WAL replay through Structured Streaming + windowed event aggs. */
class StreamingSpec extends SparkSpec {

  def schema = TableSchema("WalTable", Seq(
    FieldSchema("ID", FieldType.Int4, primaryKey = true),
    FieldSchema("Doc", FieldType.Str),
    FieldSchema("Vec", FieldType.VectorFloat, dimensions = 2, metric = MetricType.Euclidean)))

  test("WAL replay: insert, upsert, delete applied in gid order via readStream") {
    val walDir = tmpDir("wal")
    val store = TableStore.create(spark, tmpDir("wal_store"), schema)

    WalStream.append(walDir, 1, "INSERT",
      payload = """{"ID":1,"Doc":"one","Vec":[1.0,0.0]}
                  |{"ID":2,"Doc":"two","Vec":[0.0,1.0]}""".stripMargin)
    WalStream.append(walDir, 2, "UPSERT",
      payload = """{"ID":2,"Doc":"two-v2","Vec":[0.5,0.5]}""")
    WalStream.append(walDir, 3, "INSERT",
      payload = """{"ID":3,"Doc":"three","Vec":[1.0,1.0]}""")
    WalStream.append(walDir, 4, "DELETE", pks = Seq("1"))

    val q = WalStream.start(spark, walDir, store, tmpDir("wal_ckpt"))
    try q.processAllAvailable() finally q.stop()

    val rows = store.read().select("ID", "Doc").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(2 -> "two-v2", 3 -> "three"), s"got $rows")
  }

  test("incremental dedup: checkpointed digest state dedups a second snapshot across restarts") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}
    val srcDir = tmpDir("dd_stream_src")
    val ckpt = tmpDir("dd_stream_ckpt")
    val outDir = tmpDir("dd_stream_out")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val src = spark.readStream.schema(docSchema).parquet(srcDir)
      val q = graft.streaming.DocStream
        .incrementalDedup(src, keepCols = Seq("doc_id"))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // snapshot 1: two distinct docs
    Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(spark.read.parquet(outDir).count() == 2)
    // snapshot 2 after a "restart": one text-dup of doc 1, one new doc.
    // The dup digest is already in the checkpointed state store, so it is
    // NOT re-emitted — the survivor stays the first-seen doc_id.
    Seq((3L, "alpha doc"), (4L, "gamma doc")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3, out.collect().mkString(","))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), ids.toString)
  }

  test("incremental paragraph dedup: checkpointed paragraph-digest state scrubs boilerplate across restarts") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}
    import org.apache.spark.sql.functions.col
    val srcDir = tmpDir("pd_stream_src")
    val ckpt = tmpDir("pd_stream_ckpt")
    val outDir = tmpDir("pd_stream_out")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val src = spark.readStream.schema(docSchema).parquet(srcDir)
      val q = graft.streaming.DocStream
        .incrementalParagraphDedup(src, "doc_id",
          graft.pipeline.Dedup.blankLineParagraphs(col("text")))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // snapshot 1: header + body A, and a header-only doc — the shared
    // header must be emitted exactly once
    Seq((1L, "SITE HEADER\n\nalpha body"), (2L, "SITE HEADER"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val out1 = spark.read.parquet(outDir)
    assert(out1.count() == 2, out1.collect().mkString(","))
    assert(out1.select("para").collect().map(_.getString(0)).toSet ==
      Set("SITE HEADER", "alpha body"))
    // snapshot 2 after a "restart": the header again (checkpointed state
    // drops it) plus a new body — only the new paragraph is emitted
    Seq((3L, "SITE HEADER\n\nbeta body")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val out2 = spark.read.parquet(outDir)
    assert(out2.count() == 3, out2.collect().mkString(","))
    assert(out2.select("para").collect().map(_.getString(0)).toSet ==
      Set("SITE HEADER", "alpha body", "beta body"))
    // the survivor of the shared header is the first-seen source doc
    val headerSrc = out2.filter(col("para") === "SITE HEADER")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(headerSrc.length == 1 && Set(1L, 2L).contains(headerSrc.head),
      headerSrc.toString)
  }

  test("incremental span dedup: checkpointed shingle state masks a shifted span across restarts") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}
    import org.apache.spark.sql.functions.col
    val srcDir = tmpDir("sp_stream_src")
    val ckpt = tmpDir("sp_stream_ckpt")
    val outDir = tmpDir("sp_stream_out")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val q = graft.streaming.DocStream
        .incrementalSpanDedup(
          spark.readStream.schema(docSchema).parquet(srcDir), "doc_id", "text", k = 3)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // snapshot 1: 5-token doc -> 3 shingle starts, all first-seen
    Seq((1L, "s1 s2 s3 s4 s5")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val out1 = spark.read.parquet(outDir)
    assert(out1.count() == 3, out1.collect().mkString(","))
    assert(out1.select("doc_id").collect().forall(_.getLong(0) == 1L))
    // snapshot 2 after a "restart": the same span SHIFTED by two tokens.
    // Its three interior shingles hit checkpointed state (not re-emitted
    // = mask-eligible downstream); only the two boundary-straddling
    // shingles are new
    Seq((2L, "b1 b2 s1 s2 s3 s4 s5")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val out2 = spark.read.parquet(outDir)
    assert(out2.count() == 5, out2.collect().mkString(","))
    val doc2 = out2.filter(col("doc_id") === 2L)
      .select("pos").collect().map(_.getInt(0)).toSet
    // new shingles of doc 2: starts 0 (b1 b2 s1) and 1 (b2 s1 s2); the
    // span's own starts 2,3,4 were seen in snapshot 1
    assert(doc2 == Set(0, 1), doc2.toString)
  }

  test("clean stream twin: snapshot-2 shifted span masks against snapshot-1 state; union equals batch") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}
    import org.apache.spark.sql.functions.col
    val srcDir = tmpDir("cl_stream_src")
    val ckpt = tmpDir("cl_stream_ckpt")
    val outDir = tmpDir("cl_stream_out")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // docs that PASS C4 (punctuated ≥5-word lines, ≥3 sentences, no
    // braces) and Gopher (≥50 alpha tokens, stops present, sane word
    // lengths); the 10-token span appears once in snapshot 1 (doc 1) and
    // SHIFTED inside snapshot 2 (doc 21) — paragraph/window units would
    // both miss the shifted alignment, the span state must not
    val span = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    // per-doc UNIQUE filler (tagged words): the span must be the ONLY
    // cross-doc repeat, or its masking is indistinguishable from filler
    // masking
    def doc(tag: String, mid: String): String = {
      def line(i: Int) =
        s"the quiet${tag}$i engine hums and the long river$tag$i bends with that easy grace."
      s"report $tag begins now and $mid the crew watched and waited with patience.\n" +
        s"${line(1)}\n${line(2)}\n" +
        s"every line$tag here ends with the punctuation that keeps it going.\n" +
        s"${line(3)}"
    }
    val snap1 = Seq(
      (1L, doc("aa", s"$span holds the key while")),
      (2L, doc("bb", "nothing repeated appears in this one so")))
    val snap2 = Seq(
      (21L, doc("cc", s"$span holds the key while")),
      (22L, doc("dd", "its content stays its own so")))
    def run(): Unit = {
      val q = graft.streaming.DocStream
        .cleanStreamEmit(
          spark.readStream.schema(docSchema).parquet(srcDir), "text",
          "doc_id", k = 8)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    snap1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    snap2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val emitted = spark.read.parquet(outDir)
    // snapshot 1 won every shingle of the shared span: no emitted winner
    // of the span's interior shingles names doc 21
    val winners21 = emitted.filter(col("id") === 21L).count()
    val all21 = graft.streaming.DocStream
      .incrementalSpanDedup(snap2.toDF("doc_id", "text").limit(1)
        .filter(col("doc_id") === 21L), "doc_id", "text", 8).count()
    assert(winners21 < all21,
      s"doc 21 won all $all21 of its shingles — snapshot-1 state ignored")
    // the consumer masks doc 21's copy of the span against the state
    val consumed2 = graft.streaming.DocStream.cleanConsume(
      snap2.toDF("doc_id", "text"), emitted, "text", "doc_id", 8)
    val c21 = consumed2.filter(col("doc_id") === 21L)
      .select("clean_text").head.getString(0)
    assert(!c21.contains("charlie delta echo"),
      s"snapshot-2 copy of the span survived: $c21")
    assert(c21.contains("quietcc1 engine"), s"unique text was over-masked: $c21")
    // batch-vs-streaming survivor equality on the UNION (snapshot-1 ids
    // are lower, so the batch min(id, pos) winner is the same doc the
    // stream's first-batch rule picked)
    val union = (snap1 ++ snap2).toDF("doc_id", "text")
    val streaming = graft.streaming.DocStream
      .cleanConsume(union, emitted, "text", "doc_id", 8)
      .select("doc_id", "clean_text", "n_final")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.pipeline.Pipelines.cleanCorpusFull(union, "text", "doc_id", 8)
      .select("doc_id", "clean_text", "n_final")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streaming == batch, s"streaming $streaming\nvs batch $batch")
    assert(batch.map(_._1).contains(1L) && batch.nonEmpty)
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("always-on clean: masked-text twin from snapshot 2 drops via checkpointed digest state") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}
    val base = java.nio.file.Files.createTempDirectory("clean_incr_spec")
    def p(s: String) = base.resolve(s).toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // six 10-token span lines banked in doc 1 (lowest id: wins every
    // span shingle). Docs 2 and 21 interleave DIFFERENT banked spans
    // between the SAME four short (< 8-token, so never self-shingling)
    // connective lines: masking strips each doc's spans, leaving the
    // identical "X M M2 Y" remainder — different ORIGINALS, equal
    // MASKED text, the cross-stage interaction the digest state exists
    // for. Doc 21 arrives in snapshot 2 and must drop against doc 2's
    // checkpointed digest without re-reading snapshot 1.
    // tags at token positions 1, 6 and 11 (the LAST token): every
    // 8-window crossing a span boundary carries a tag, so boundary
    // windows stay unique per doc — only fully-internal span windows
    // repeat against the bank, and the connectives survive masking
    def spanLine(tag: String) =
      s"the $tag falcon crossed wide rivers $tag under bright skies calm $tag."
    val spans = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
      .map(spanLine)
    val xLine = "the crew wrote factual notes today."
    val mLine = "and the log grew longer still."
    val m2Line = "but the wind kept its pace."
    val yLine = "so the watch ended without incident."
    def fillerLine(tag: String, i: Int) =
      s"the quiet$tag$i engine hums and the long river$tag$i bends with easy grace."
    val doc1 = (fillerLine("bank", 0) +: spans.zipWithIndex.flatMap {
      case (s, i) => Seq(s, fillerLine("bank", i + 1))
    }).mkString("\n")
    def combo(a: Int, b: Int, c: Int) =
      Seq(xLine, spans(a), mLine, spans(b), m2Line, spans(c), yLine)
        .mkString("\n")
    def uniq(tag: String) = (0 to 4).map(i => fillerLine(tag, i)).mkString("\n")
    val snap1 = Seq((1L, doc1), (2L, combo(0, 2, 4)), (3L, uniq("uu")))
    val snap2 = Seq((21L, combo(1, 3, 5)), (22L, uniq("vv")))
    def pass(snap: Seq[(Long, String)]): Unit = {
      snap.toDF("doc_id", "text").coalesce(1).write.mode("append")
        .parquet(p("src"))
      val q = graft.streaming.DocStream
        .cleanStreamEmit(
          spark.readStream.schema(docSchema).parquet(p("src")), "text",
          "doc_id", 8)
        .writeStream.format("parquet").option("path", p("wins"))
        .option("checkpointLocation", p("ck_emit"))
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.DocStream.cleanConsumeIncremental(
        snap.toDF("doc_id", "text"), spark.read.parquet(p("wins")),
        p("inbox"), p("ck_dedup"), p("out"), "text", "doc_id", 8)
    }
    pass(snap1)
    val out1 = spark.read.parquet(p("out")).select("id").as[Long]
      .collect().toSet
    assert(out1 == Set(1L, 2L, 3L), s"snapshot-1 survivors drifted: $out1")
    pass(snap2) // separate queries, shared checkpoints = the restart path
    // the fixture really is the masked-text-twin interaction: different
    // originals, equal masked text, both non-empty
    val inboxRows = spark.read.parquet(p("inbox"))
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(inboxRows(21L) == inboxRows(2L),
      s"fixture drifted — masked texts differ:\n${inboxRows(2L)}\nvs\n${inboxRows(21L)}")
    assert(inboxRows(21L).nonEmpty)
    val out2 = spark.read.parquet(p("out")).select("id").as[Long]
      .collect().toSet
    assert(!out2.contains(21L),
      s"snapshot-2 masked twin survived the checkpointed digest state: $out2")
    assert(out2 == Set(1L, 2L, 3L, 22L), s"survivors drifted: $out2")
    graft.pipeline.StageCaches.unpersistAll()
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("TTL span state: hot shingles stay suppressed, expired ones re-win") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}
    val base = java.nio.file.Files.createTempDirectory("ttl_span_spec")
    def p(s: String) = base.resolve(s).toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"
    def pass(snap: Seq[(Long, String)]): Unit = {
      snap.toDF("doc_id", "text").coalesce(1).write.mode("append")
        .parquet(p("src"))
      val q = graft.streaming.DocStream.incrementalSpanWinnersTtl(
          spark.readStream.schema(docSchema).parquet(p("src")),
          "doc_id", "text", k = 8, ttlMs = 2000L)
        .toDF()
        .writeStream.format("parquet").option("path", p("out"))
        .option("checkpointLocation", p("ck"))
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def winnersOf(docId: Long): Long =
      spark.read.parquet(p("out")).filter(col("id") === docId).count()
    pass(Seq((1L, span)))
    assert(winnersOf(1L) == 1L) // one shingle (8 tokens, k=8)
    // within the TTL: the duplicate is suppressed (and refreshes)
    pass(Seq((2L, span)))
    assert(winnersOf(2L) == 0L, "within-TTL duplicate re-won")
    // wait out the TTL, then two unrelated batches: the FIRST advances
    // the watermark past the timer, the SECOND (running under that
    // watermark — it lags one batch) fires the lazy eviction for the
    // now-idle group; the next occurrence must then win again
    Thread.sleep(3000)
    pass(Seq((3L, "totally different words forming another doc here now")))
    pass(Seq((4L, "yet another unrelated document with its own words here")))
    pass(Seq((5L, span)))
    assert(winnersOf(5L) == 1L,
      s"expired shingle did not re-win: ${spark.read.parquet(p("out"))
        .collect().mkString(", ")}")
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("WAL replay resumes from checkpoint without reapplying") {
    val walDir = tmpDir("wal2")
    val ckpt = tmpDir("wal2_ckpt")
    val store = TableStore.create(spark, tmpDir("wal2_store"), schema)
    WalStream.append(walDir, 1, "INSERT", payload = """{"ID":1,"Doc":"a","Vec":[1.0,0.0]}""")
    val q1 = WalStream.start(spark, walDir, store, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(store.count() == 1)
    // second entry arrives after a "restart"
    WalStream.append(walDir, 2, "INSERT", payload = """{"ID":2,"Doc":"b","Vec":[0.0,1.0]}""")
    val q2 = WalStream.start(spark, walDir, store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val ids = store.read().select("ID").collect().map(_.getInt(0)).toSet
    assert(ids == Set(1, 2)) // id 1 NOT duplicated => batch 0 not reapplied
  }

  test("WAL bulk insert by payloadPath: rows read distributedly, not via a driver string") {
    val walDir = tmpDir("wal3")
    val store = TableStore.create(spark, tmpDir("wal3_store"), schema)
    // bulk payload lives in its own JSON-lines file; the WAL entry carries
    // only the path
    val bulkDir = tmpDir("wal3_bulk")
    val lines = (1 to 1000).map(i =>
      s"""{"ID":$i,"Doc":"bulk$i","Vec":[$i.0,0.0]}""").mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$bulkDir/part-0.json"),
      lines.getBytes)
    WalStream.append(walDir, 1, "INSERT", payloadPath = bulkDir)
    WalStream.append(walDir, 2, "DELETE", filter = "ID > 900")
    val q = WalStream.start(spark, walDir, store, tmpDir("wal3_ckpt"))
    try q.processAllAvailable() finally q.stop()
    assert(store.count() == 900)
    assert(WalStream.consumedGid(store) == 2)
  }

  test("streaming hourly aggregate over the events table matches batch") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // batch-run the streaming plan (same analyzed logical plan semantics)
    val streamed = spark.readStream
      .schema(events.schema)
      .parquet("/root/testdata/sf0.001")
    // restrict to the events files via where clause on a column unique to events
    val agg = EventStream.hourlyAggregate(events) // batch DataFrame through the same builder
    val got = agg.orderBy(col("window.start"), col("event_type")).collect()
    assert(got.nonEmpty)
    val total = got.map(_.getAs[Long]("n")).sum
    assert(total == events.count())
  }

  test("streaming query runs end-to-end with memory sink") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("stream_events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventStream.hourlyAggregate(src)
      .writeStream.outputMode("update")
      .format("memory").queryName("ev_agg")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.sql("SELECT sum(n) FROM ev_agg").head().getLong(0)
    assert(n == 1000L)
  }
}
