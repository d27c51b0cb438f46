package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Pipelines, TextAnalysis}

/** Round-15 additions: the joined-weight trainer cutover (bit-equality
  * against the driver path), the bpeFit count floor / top-M word-table
  * bounds, and the winnerKey descending-priority type rules. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private lazy val fitCorpus = (0 until 60).map { i =>
    if (i % 7 == 3) (i.toLong, "", (i % 2).toDouble) // empty docs ride along
    else (i.toLong,
      (if (i % 2 == 0) s"good solid fine f$i extra$i" else s"bad broken junk f$i extra$i"),
      (i % 2 % 2).toDouble)
  }.toDF("id", "text", "y")

  test("linearFitDf joined path is BIT-equal to the driver path (plain/bigram/hashed)") {
    for ((ng, hb) <- Seq((1, 0), (2, 0), (2, 16))) {
      val (wm, bm) = TextAnalysis.linearFit(fitCorpus, "text", "y",
        iterations = 3, lr = 0.7, wordNgrams = ng, hashBuckets = hb)
      val (wdf, bd) = TextAnalysis.linearFitDf(fitCorpus, "text", "y",
        iterations = 3, lr = 0.7, wordNgrams = ng, hashBuckets = hb,
        vocabCutover = 0L) // force the joined engine
      val wj = wdf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(bm == bd, s"bias drifted (ng=$ng hb=$hb): $bm vs $bd")
      assert(wj.keySet == wm.keySet,
        s"vocab drifted (ng=$ng hb=$hb): ${wj.keySet.diff(wm.keySet)} / ${wm.keySet.diff(wj.keySet)}")
      val diff = wm.filter { case (t, v) => wj(t) != v }
      assert(diff.isEmpty,
        s"weights drifted (ng=$ng hb=$hb): ${diff.take(3)} vs ${diff.keys.take(3).map(wj)}")
    }
  }

  test("linearFitDf at/below the cutover delegates to the driver path, same result") {
    val (wm, bm) = TextAnalysis.linearFit(fitCorpus, "text", "y", 2, 0.5)
    val (wdf, bd) = TextAnalysis.linearFitDf(fitCorpus, "text", "y", 2, 0.5)
    val wj = wdf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bm == bd && wj == wm)
  }

  test("bpeFit minWordCount prunes tail words out of the pair mass; maxWords keeps top-M") {
    // 'zz' pair mass: 10 from the heavy word, 4 from four singleton words;
    // with the floor the singletons vanish and counts change accordingly
    val docs = (
      Seq.fill(10)("zzq") ++ Seq("zza", "zzb", "zzc", "zzd") ++
        Seq.fill(6)("mmn")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val unpruned = TextAnalysis.bpeFit(docs, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(unpruned.head == (("z", "z", 14L)), unpruned.mkString(","))
    // floor removes the singleton zz? words: (z,z) drops to 10, TIES
    // (z,q) at 10, and the (left, right) lexicographic tie-break now
    // picks (z,q) — the floor changed the model exactly as predicted
    val floored = TextAnalysis.bpeFit(docs, "text", 1, minWordCount = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(floored.head == (("z", "q", 10L)), floored.mkString(","))
    // maxWords=1 keeps only the top word (count desc, word asc): 'zzq';
    // same tie then the follow-up merge over the merged symbol
    val capped = TextAnalysis.bpeFit(docs, "text", 2, maxWords = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(capped.toSeq == Seq(("z", "q", 10L), ("z", "zq", 10L)),
      capped.mkString(","))
  }

  test("winnerKey desc: integral types reverse exactly (Long.MinValue included)") {
    val docs = Seq(
      (1L, "dup", Long.MinValue), // negate would overflow to MinValue and win
      (2L, "dup", 5L),
      (3L, "dup", 9L),
      (4L, "solo", 1L)).toDF("id", "text", "prio")
    val got = Dedup.dropExactDuplicatesBy(docs, "text", "id",
        Seq(col("prio").desc))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L, 4L), got.toString) // highest prio wins, not MinValue
  }

  test("winnerKey desc: timestamp/date priorities order correctly; strings fail loudly") {
    val ts = Seq(
      (1L, "dup", java.sql.Timestamp.valueOf("2024-01-01 00:00:00.001")),
      (2L, "dup", java.sql.Timestamp.valueOf("2024-01-01 00:00:00.002")))
      .toDF("id", "text", "seen")
    val got = Dedup.dropExactDuplicatesBy(ts, "text", "id", Seq(col("seen").desc))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), got.toString) // latest-seen survivorship
    val sdocs = Seq((1L, "dup", "b"), (2L, "dup", "a")).toDF("id", "text", "s")
    val e = intercept[IllegalArgumentException] {
      Dedup.dropExactDuplicatesBy(sdocs, "text", "id", Seq(col("s").desc)).collect()
    }
    assert(e.getMessage.contains("descending survivor priority"), e.getMessage)
  }

  test("linearClassifyLabelJoined equals the kernel apply — scores, argmax, ties, empty docs") {
    val classes = Seq("aa", "bb", "cc")
    val biases = Seq(0.05, 0.01, 0.01)
    val weights = Map(
      "alpha" -> Seq(2.0, 0.0, 0.0),
      "beta" -> Seq(0.0, 2.0, 0.0),
      "tied" -> Seq(0.0, 1.5, 1.5)) // bb/cc tie on 'tied'-only docs
    val docs = Seq(
      (1L, "alpha alpha beta x"),
      (2L, "beta beta"),
      (3L, "tied tied"), // bb vs cc tie at equal bias -> first class wins
      (4L, ""), // empty: biases only -> aa
      (5L, "unknown words only here")).toDF("doc_id", "text")
    val kernel = docs.select(col("doc_id"),
        TextAnalysis.linearClassifyLabel(col("text"), classes, weights,
          biases).as("pred_class"),
        array_max(TextAnalysis.linearClassifyScores(col("text"), classes,
          weights, biases)).as("z_max"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val wdf = weights.toSeq.flatMap { case (t, ws) =>
      classes.zip(ws).map { case (c, w) => (t, c, w) } }
      .toDF("token", "class", "weight")
    val joined = TextAnalysis.linearClassifyLabelJoined(docs, "text",
        "doc_id", wdf, classes.zip(biases))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(joined == kernel, s"joined $joined\nvs kernel $kernel")
    assert(kernel.exists { case (id, c, _) => id == 3L && c == "bb" })
    assert(kernel.exists { case (id, c, _) => id == 4L && c == "aa" })
  }

  test("linearFitOneVsAllDf through the joined engine equals the driver one-vs-all") {
    val docs = (0 until 45).map { i =>
      val c = Seq("de", "en", "fr")(i % 3)
      (i.toLong, s"mark_$c common tok$i", c)
    }.toDF("id", "text", "lang")
    val (cm, tm, bm) = TextAnalysis.linearFitOneVsAll(docs, "text", "lang",
      iterations = 3, lr = 0.8)
    val (cj, wdf, bj) = TextAnalysis.linearFitOneVsAllDf(docs, "text", "lang",
      iterations = 3, lr = 0.8, vocabCutover = 0L)
    assert(cm == cj && bm == bj, s"$cm/$bm vs $cj/$bj")
    val joined = wdf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // driver table fills absent (token, class) with 0.0; the frame omits
    // the row — equality modulo that fill
    val driver = for ((t, ws) <- tm.toSeq; (c, w) <- cm.zip(ws)) yield ((t, c), w)
    val diff = driver.filter { case (k, w) => joined.getOrElse(k, 0.0) != w }
    assert(diff.isEmpty, diff.take(5).toString)
    assert(joined.keys.forall { case (t, _) => tm.contains(t) })
  }

  test("ccnet with a joined model DataFrame equals the kernel-model ccnet") {
    val classes = Seq("aa", "bb")
    val weights = Map("alpha" -> Seq(3.0, 0.0), "beta" -> Seq(0.0, 3.0))
    val biases = Seq(0.0, 0.0)
    val corpus = (0 until 24).map { i =>
      val m = if (i % 2 == 0) "alpha" else "beta"
      val body = if (i < 12) s"same phrase here again $i" // denser n-grams
        else s"odd${i}x rare${i}y words${i}z"
      (i.toLong, s"$m $body $m")
    }.toDF("doc_id", "text")
    val lms = classes.map { c =>
      val ci = classes.indexOf(c)
      c -> TextAnalysis.bigramLmFit(corpus.filter(col("doc_id") % 2 === ci))
    }.toMap
    val kernel = Pipelines.ccnet(corpus, "text", "doc_id", classes, weights,
        biases, lms, midKeepPermille = 500)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val wdf = weights.toSeq.flatMap { case (t, ws) =>
      classes.zip(ws).map { case (c, w) => (t, c, w) } }
      .toDF("token", "class", "weight")
    val joined = Pipelines.ccnet(corpus, "text", "doc_id", wdf,
        classes.zip(biases), lms, midKeepPermille = 500)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(joined == kernel && kernel.nonEmpty, s"$joined vs $kernel")
  }

  test("quantileBuckets generalizes to q=4 and nulls get null buckets") {
    val df = (Seq.tabulate(40)(i => (i.toLong, "en", Some(i.toDouble))) :+
      ((99L, "en", Option.empty[Double]))).toDF("id", "cls", "s")
    val out = Pipelines.quantileBuckets(df, "cls", "s", 4)
      .select("id", "bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out(99L) == -1)
    // 40 values 0..39: quartile cutoffs at 9, 19, 29 (cum*4 >= i*40)
    assert(out(0L) == 1 && out(9L) == 1 && out(10L) == 2 && out(19L) == 2 &&
      out(20L) == 3 && out(29L) == 3 && out(30L) == 4 && out(39L) == 4,
      out.toSeq.sortBy(_._1).mkString(","))
  }

  test("quantileBuckets fails actionably when a class exceeds the distinct-score bound") {
    // an unrounded score column would grow the cutoff array toward
    // corpus size — the guard must name the problem, not OOM later
    val df = Seq.tabulate(50)(i => (i.toLong, "en", i * 1.0000001))
      .toDF("id", "cls", "s")
    val e = intercept[Exception] {
      Pipelines.quantileBuckets(df, "cls", "s", 3, maxDistinctScores = 10)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("round the score column")),
      msgs(e).mkString(" | "))
  }
}
