package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_SPAN_N > 0: span-mask scale probe on synthetic docs —
    // every 5th doc carries the same planted 30-token span at a varying
    // offset (the alignment-shifted case), surrounded by unique filler.
    val spanN = sys.env.getOrElse("SPARK_GRAFT_SPAN_N", "0").toLong
    if (spanN > 0) {
      val span = (1 to 30).map(i => s"sp$i").mkString(" ")
      val sdocs = spark.range(spanN).select(col("id").as("doc_id"),
        concat_ws(" ",
          array_join(transform(sequence(lit(1), (col("id") % 13 + 1).cast("int")),
            i => concat(lit("u"), col("id"), lit("_"), i)), " "),
          when(col("id") % 5 === 0, lit(span)).otherwise(lit("")),
          array_join(transform(sequence(lit(1), lit(40)),
            i => concat(lit("v"), col("id"), lit("_"), i)), " ")).as("text"))
      val t0 = System.nanoTime()
      val r = graft.pipeline.Dedup.maskRepeatedSpans(sdocs, "doc_id", "text", 8)
        .agg(sum(col("n_tokens")), sum(col("n_masked")),
          count(when(col("n_masked") > 0, 1))).head()
      println(f"span-mask n=$spanN: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"tokens=${r.getLong(0)} masked=${r.getLong(1)} docsMasked=${r.getLong(2)} " +
        s"expectedDocsMasked=${(spanN + 4) / 5 - 1}")
      spark.stop()
      return
    }
    // SPARK_GRAFT_BPE_N > 0: BPE-training scale probe — N synthetic docs
    // with ~N distinct words (unique word per doc + pooled words), the
    // learned merge table compared EXACTLY against an independent local
    // reference implementation over the same word multiset (the sf
    // corpora have only ~31 distinct words, far too small to exercise
    // the word-table path).
    val bpeN = sys.env.getOrElse("SPARK_GRAFT_BPE_N", "0").toLong
    if (bpeN > 0) {
      val rounds = 8
      val sdocs = spark.range(bpeN).select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("alpha"), pmod(col("id"), lit(9973))),
          concat(lit("beta"), pmod(col("id"), lit(997))),
          concat(lit("uniq"), col("id")),
          lit("common common tail")).as("text"))
      // reference: plain-Scala Sennrich loop on the collected word counts
      val wc = sdocs
        .select(explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      println(s"bpe-fit probe: n=$bpeN distinctWords=${wc.length}")
      def mergeGreedy(toks: Vector[String], l: String, r: String): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.result()
      }
      var ws = wc.map { case (w, c) => (w.toCharArray.map(_.toString).toVector, c) }
      val expected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var r0 = 0
      while (r0 < rounds) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((toks, c) <- ws; i <- 0 until toks.length - 1)
          counts((toks(i), toks(i + 1))) =
            counts.getOrElse((toks(i), toks(i + 1)), 0L) + c
        val ((l, rr), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        expected += ((l, rr, c))
        ws = ws.map { case (toks, cc) => (mergeGreedy(toks, l, rr), cc) }
        r0 += 1
      }
      val t0 = System.nanoTime()
      val got = graft.pipeline.TextAnalysis.bpeFit(sdocs, "text", rounds)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      println(f"bpe-fit $rounds rounds: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println(s"got:      ${got.mkString(", ")}")
      println(s"expected: ${expected.mkString(", ")}")
      println(s"MATCH=${got == expected.toSeq}")
      spark.stop()
      return
    }
    // SPARK_GRAFT_FIT_N > 0: logistic-trainer scale probe — N synthetic
    // docs with planted class markers + ~N unique filler tokens (vocab
    // ~= N), timing per GD iteration and asserting the planted signs.
    val fitN = sys.env.getOrElse("SPARK_GRAFT_FIT_N", "0").toLong
    if (fitN > 0) {
      val sdocs = spark.range(fitN).select(col("id").as("doc_id"),
        (col("id") % 2).cast("double").as("y"),
        concat_ws(" ",
          when(col("id") % 2 === 1, lit("posmark")).otherwise(lit("negmark")),
          concat(lit("filler"), col("id")),
          lit("shared tokens everywhere")).as("text"))
      val t0 = System.nanoTime()
      val (w, b) = graft.pipeline.TextAnalysis.linearFit(
        sdocs, "text", "y", iterations = 3, lr = 1.0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"linear-fit n=$fitN vocab=${w.size} 3 iters: $secs%.2f s " +
        f"(${secs / 3}%.2f s/iter)")
      println(s"posmark=${w("posmark")} negmark=${w("negmark")} bias=$b")
      println(s"MATCH=${w("posmark") > 0 && w("negmark") < 0}")
      spark.stop()
      return
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(s"docs=${docs.count()}")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s (rows=$n)")
    }
    time("tokens+shingle-md5 only") {
      docs.select(Dedup.shingleHashes(col("text")).as("hs"))
        .select(sum(size(col("hs")))).head(); docs.count()
    }
    time("signatures") { Dedup.minhashSignatures(docs, "text", "doc_id", 32).count() }
    time("lsh candidates") { Dedup.lshCandidatePairs(docs, "text", "doc_id", 32, 8).count() }
    time("full minhashNearDuplicates") {
      Dedup.minhashNearDuplicates(docs, "text", "doc_id", 0.5, 32, 8).count()
    }
    spark.stop()
  }
}
