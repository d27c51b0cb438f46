package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.pipeline.TextAnalysis

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
    // AFTER its digest expired from the TTL state: the sleep lapses the
    // TTL FIRST, then snapshot 2 advances the watermark past the timer
    // and snapshot 3 fires the lazy eviction (the watermark lags one
    // batch — Round17Spec's proven ordering; sleeping after snapshots
    // 2-3 instead leaves the watermark at t3 < t1+ttl and the digest
    // never expires). The pure TTL form then re-admits id 5, the
    // hybrid's anti-join against the accumulated outDir catches it,
    // and the all-history form is the reference.
    val docSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def fillerLine(tag: String, i: Int) =
      s"the quiet$tag$i engine hums and the long river$tag$i bends with easy grace."
    def doc(tag: String) = (0 to 4).map(i => fillerLine(tag, i)).mkString("\n")
    val snaps: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> doc("aa"), 2L -> doc("aa")), // in-batch dup: min-id wins
      Seq(3L -> doc("bb")),                  // watermark advance past timer
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
        if (i == 1) Thread.sleep(3000) // let ttl=2000 lapse before snap 2
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

  // ---- interpolated modified Kneser-Ney ----
  // Fixture corpus (class x): "a b a b c" / "a b c d" / "b c a".
  // Hand-derived statistics (tools/kn_reference.py is the written-out
  // third formulation; the arithmetic below was checked by hand):
  //   raw bigram types: ab:3 ba:1 bc:3 cd:1 ca:1
  //   continuation unigrams a1 (distinct left-extensions): a:2 b:1 c:1 d:1
  //   order-1 count-of-counts n1..n4 = (3,1,0,0) -> Y=0.6,
  //     D = (0.6, 2.0 [n3=0 via formula], 1.5 [n3=0 fallback])
  //   order-2 count-of-counts (3,0,2,0) -> Y=1, D = (1.0, 1.0 fb, 3.0)
  //   class scalars: S1=5, (u1,u2,u3p)=(3,1,0), V=4
  //   e.g. p(b|a): hist a -> S=3, N3+=1; a(ab)=3 discounted by D3=3.0
  //     to 0; gamma = 3.0*1/3 = 1; p1(b) = max(1-0.6,0)/5
  //     + ((0.6*3 + 2.0*1 + 1.5*0)/5)/4 = 0.08 + 0.19 = 0.27
  //   OOV-everything doc: p = uniform term 0.19 -> nll = 1.6607
  private val knDocs = Seq(
    (1L, "x", "a b a b c"), (2L, "x", "a b c d"), (3L, "x", "b c a"))

  test("modified-KN order-2: hand-computed discounts, continuation counts, OOV and clamp branches") {
    val fit = knDocs.toDF("doc_id", "cls", "text")
    val lm = TextAnalysis.knLmFitByClass(fit, "text", "doc_id", "cls",
      order = 2)
    // discounts and scalars exactly as hand-derived
    val d = lm.discounts.head()
    assert(math.abs(d.getAs[Double]("d1_1") - 0.6) < 1e-12)
    assert(d.getAs[Double]("d2_1") == 2.0 && d.getAs[Double]("d3_1") == 1.5)
    assert(d.getAs[Double]("d1_2") == 1.0 && d.getAs[Double]("d2_2") == 1.0
      && d.getAs[Double]("d3_2") == 3.0)
    val cs = lm.classStats.head()
    assert(cs.getAs[Long]("s1") == 5L && cs.getAs[Long]("u1") == 3L &&
      cs.getAs[Long]("u2") == 1L && cs.getAs[Long]("u3p") == 0L &&
      cs.getAs[Long]("v") == 4L)
    val a1 = lm.grams.head.collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("a")).toMap
    assert(a1 == Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L),
      s"continuation unigrams drifted: $a1")
    val score = knDocs ++ Seq((4L, "x", "c d a b"), (5L, "x", "z z z"),
      (6L, "x", "a"), (7L, "zz", "a b"))
    val got = TextAnalysis.knLmApplyJoined(lm,
        score.toDF("doc_id", "cls", "text"), "text", "doc_id", "cls")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null
        else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    val expect = Map(1L -> 1.3972, 2L -> 1.3093, 3L -> 1.485,
      4L -> 1.4265, 5L -> 1.6607)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, want $e") }
    assert(got(6L) == null, "doc shorter than order must score NULL")
    assert(got(7L) == null, "unfitted class must score NULL")
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("modified-KN order-3 with and without pruning matches the reference; save/load roundtrips") {
    val fit = knDocs.toDF("doc_id", "cls", "text")
    val score = (knDocs ++ Seq((4L, "x", "c d a b"), (5L, "x", "z z z")))
      .toDF("doc_id", "cls", "text")
    def scores(lm: TextAnalysis.KnLmByClass): Map[Long, Double] =
      TextAnalysis.knLmApplyJoined(lm, score, "text", "doc_id", "cls")
        .collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lm1 = TextAnalysis.knLmFitByClass(fit, "text", "doc_id", "cls",
      order = 3)
    assert(scores(lm1) == Map(1L -> 1.1223, 2L -> 1.2433, 3L -> 1.2264,
      4L -> 1.485, 5L -> 1.6607), s"order-3 minCount=1: ${scores(lm1)}")
    // pruning drops singleton ADJUSTED counts from the numerators only —
    // stats stay full-corpus, pruned grams fall through gamma * p_{k-1}
    val lm2 = TextAnalysis.knLmFitByClass(fit, "text", "doc_id", "cls",
      order = 3, minCount = 2)
    assert(scores(lm2) == Map(1L -> 1.8744, 2L -> 1.9224, 3L -> 2.0662,
      4L -> 1.6607, 5L -> 1.6607), s"order-3 minCount=2: ${scores(lm2)}")
    val dir = java.nio.file.Files.createTempDirectory("kn_save").toString
    lm2.save(dir)
    val lm2r = TextAnalysis.KnLmByClass.load(spark, dir)
    assert(lm2r.order == 3 && lm2r.minCount == 2 &&
      scores(lm2r) == scores(lm2), "save/load drifted")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("per-class KN == per-class sequential global fits (the flat-in-C joined plan changes nothing)") {
    val fit = (knDocs ++ Seq((11L, "y", "p q p q r"), (12L, "y", "q r s"),
      (13L, "y", "p q s p"))).toDF("doc_id", "cls", "text")
    val lm = TextAnalysis.knLmFitByClass(fit, "text", "doc_id", "cls",
      order = 2)
    val joined = TextAnalysis.knLmApplyJoined(lm, fit, "text", "doc_id",
        "cls").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val perClass = Seq("x", "y").flatMap { c =>
      val part = fit.filter(col("cls") === c)
      val g = TextAnalysis.knLmFit(part, "text", "doc_id", order = 2)
      TextAnalysis.knLmApply(g, part, "text", "doc_id").collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
    }.toMap
    assert(joined == perClass,
      s"joined != sequential per-class: $joined vs $perClass")
    graft.pipeline.StageCaches.unpersistAll()
  }

  // ---- DSIR (Xie et al. 2023 importance resampling) ----
  // Independent reference formulation: md5 via hex-string parse (the
  // tested-equivalent form of hash60), brute-force Map counting, direct
  // ln arithmetic — none of the engine's aggregate/kernel machinery.
  private def refBucket(s: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % b
  }
  private def refFeatures(text: String, b: Int): Seq[Long] = {
    val toks = if (text.trim.isEmpty) Array.empty[String]
      else text.trim.split("\\s+")
    toks.toSeq.map(refBucket(_, b)) ++
      toks.toSeq.sliding(2).filter(_.size == 2)
        .map(p => refBucket(p.mkString(" "), b))
  }
  private val dsirDocs = Seq(
    (1L, true, "the cat sat on the mat"),
    (2L, true, "the dog sat on the log"),
    (3L, false, "quantum flux capacitor alignment"),
    (4L, false, "the cat chased the dog"),
    (5L, false, ""),
    (6L, false, "mat"))

  test("DSIR fit+score matches a brute-force independent reference (micro-exact)") {
    val B = 8
    val df = dsirDocs.toDF("doc_id", "is_t", "text")
    val model = graft.pipeline.Dsir.fit(df.filter(col("is_t")), df, "text",
      wordNgrams = 2, buckets = B, alpha = 1.0)
    // brute-force counts and ratios
    val tCnt = dsirDocs.filter(_._2).flatMap(d => refFeatures(d._3, B))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rCnt = dsirDocs.flatMap(d => refFeatures(d._3, B))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (tt, rt) = (tCnt.values.sum, rCnt.values.sum)
    def lr(b: Long): Double =
      math.log(tCnt.getOrElse(b, 0L) + 1.0) - math.log(tt + 1.0 * B) -
        math.log(rCnt.getOrElse(b, 0L) + 1.0) + math.log(rt + 1.0 * B)
    assert(model.logRatio.size == B, "model must cover all buckets")
    (0 until B).foreach { b =>
      assert(model.logRatio("#" + b) == lr(b), s"bucket $b ratio drifted") }
    val got = graft.pipeline.Dsir.score(df, "text", model)
      .select(col("doc_id"), col("dsir_logw_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = dsirDocs.map { case (id, _, text) =>
      id -> refFeatures(text, B).map(b => math.round(lr(b) * 1e6)).sum
    }.toMap
    assert(got == want, s"micro scores drifted: $got vs $want")
    assert(got(5L) == 0L, "empty doc must score 0")
  }

  test("DSIR map-only kernel score == explode/join/group-by DataFrame formulation") {
    val B = 16
    val df = dsirDocs.toDF("doc_id", "is_t", "text")
    val model = graft.pipeline.Dsir.fit(df.filter(col("is_t")), df, "text",
      wordNgrams = 2, buckets = B, alpha = 0.5)
    val kernel = graft.pipeline.Dsir.score(df, "text", model)
      .select(col("doc_id"), col("dsir_logw_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val modelDf = model.logRatio.toSeq
      .map { case (k, v) => (k, math.round(v * 1e6)) }
      .toDF("bucket", "lrm")
    val joined = df.select(col("doc_id"),
        explode(graft.pipeline.Dsir.featureBuckets(
          TextAnalysis.tokens(col("text")), 2, B)).as("bucket"))
      .join(modelDf, "bucket")
      .groupBy("doc_id").agg(sum(col("lrm")).as("micro"))
    val ref = df.select(col("doc_id")).join(joined, Seq("doc_id"), "left")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    assert(kernel == ref, s"kernel != join formulation: $kernel vs $ref")
  }

  test("DSIR Gumbel top-k: deterministic keys, without-replacement selection, k edges") {
    val B = 8
    val df = dsirDocs.toDF("doc_id", "is_t", "text")
    val model = graft.pipeline.Dsir.fit(df.filter(col("is_t")), df, "text",
      wordNgrams = 2, buckets = B, alpha = 1.0)
    val scored = graft.pipeline.Dsir.score(df, "text", model)
    // reference keys: logw + standard Gumbel from the id hash
    val micro = scored.select(col("doc_id"), col("dsir_logw_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def key(id: Long): Double = {
      val u = ((refBucket(s"g:$id", 1000000).toDouble) + 0.5) / 1e6
      micro(id).toDouble / 1e6 - math.log(-math.log(u))
    }
    val want = dsirDocs.map(_._1).sortBy(id => (-key(id), id)).take(3)
    val got = graft.pipeline.Dsir.resample(scored, "doc_id", 3)
      .select(col("doc_id"), col("dsir_key")).collect()
    assert(got.map(_.getLong(0)).toSeq == want,
      s"selection drifted: ${got.map(_.getLong(0)).toSeq} vs $want")
    got.foreach(r => assert(r.getDouble(1) == key(r.getLong(0)),
      s"key drifted for doc ${r.getLong(0)}"))
    assert(graft.pipeline.Dsir.resample(scored, "doc_id", 0).count() == 0L)
    assert(graft.pipeline.Dsir.resample(scored, "doc_id", 100).count() ==
      dsirDocs.size.toLong, "k > n must keep every row")
  }

  test("bloom contamination == broadcast-exact contamination, even at a deliberately bad fpp") {
    // fpp 0.5 floods the pre-filter with false positives — the exact
    // semi-join must still remove every one of them, proving the
    // re-check is load-bearing and the bloom can never change results
    // (only shuffle volume). 120 docs, first 20 = the benchmark.
    val docs = (0 until 120).map { i =>
      val base = s"shared prefix tokens w${i % 25} x${i % 7} y${i % 3}"
      (i.toLong, s"$base unique$i tail$i closing words here")
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 20)
    val train = docs.filter(col("doc_id") >= 20)
    val exact = graft.pipeline.Dedup.contamination(train, bench,
        "text", "doc_id").orderBy("id").collect().map(_.toSeq).toSeq
    for (fpp <- Seq(0.5, 0.03)) {
      val bloomed = graft.pipeline.Dedup.contaminationBloom(train, bench,
          "text", "doc_id", fpp = fpp).orderBy("id").collect()
        .map(_.toSeq).toSeq
      assert(bloomed == exact, s"bloom twin drifted at fpp=$fpp")
    }
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("decontaminate drops over-threshold docs, keeps zero-overlap docs, bloom == exact") {
    // doc 20 copies benchmark doc 1 wholesale (overlap 1.0 -> dropped);
    // doc 21 shares a few shingles (small overlap -> kept); doc 22 is
    // fully disjoint (ZERO overlap -> absent from the contamination
    // frame, must still survive the anti-join)
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (Seq(
      (1L, benchText),
      (2L, "one two three four five six seven eight nine ten")) ++ Seq(
      (20L, benchText),
      (21L, s"alpha beta gamma unrelated filler words continue here now ok"),
      (22L, "completely disjoint vocabulary nothing shared at all here friend")))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 20)
    val train = docs.filter(col("doc_id") >= 20)
    val exact = graft.pipeline.Dedup.decontaminate(train, bench, "text",
        "doc_id", maxOverlap = 0.2).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(exact == Seq(21L, 22L),
      s"expected 20 dropped, 21 (low overlap) and 22 (zero overlap) kept: $exact")
    val bloomed = graft.pipeline.Dedup.decontaminate(train, bench, "text",
        "doc_id", maxOverlap = 0.2, useBloom = true, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(bloomed == exact, "bloom decontaminate drifted from exact")
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("DSIR model save/load roundtrips") {
    val df = dsirDocs.toDF("doc_id", "is_t", "text")
    val model = graft.pipeline.Dsir.fit(df.filter(col("is_t")), df, "text",
      wordNgrams = 2, buckets = 8, alpha = 1.0)
    val dir = java.nio.file.Files.createTempDirectory("dsir_save").toString
    model.save(spark, dir)
    val loaded = graft.pipeline.Dsir.DsirModel.load(spark, dir)
    assert(loaded == model, "save/load drifted")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
