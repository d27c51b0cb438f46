package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Equivalence of the single-pass hash expressions with their built-in
  * compositions (the DuckDB oracle computes the composed form). */
class HashExprSpec extends SparkSpec {
  import spark.implicits._

  test("all custom kernels compile under CODEGEN_ONLY (no interpreted fallback)") {
    // codegen failures normally fall back to interpreted eval silently;
    // CODEGEN_ONLY makes a broken doGenCode throw instead of hiding
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq(
        ("hello world text", Seq(1f, 2f, 2f), Seq(0, 3, 7), Seq(1f, 0f, 2f)),
        ("", Seq(0f, 0f, 0f), Seq[Int](), Seq[Float]()))
        .toDF("s", "v", "si", "sv")
        .withColumn("sp", struct(col("si").as("indices"), col("sv").as("values")))
        .withColumn("hs", array(graft.functions.hash60(col("s")), lit(7L)))
      val fam = Dedup.hashFamily(4)
      val bridge = org.apache.spark.sql.graftbridge.CatalystBridge
      val cents = Array(Array(0f, 0f, 0f), Array(1f, 2f, 2f))
      val out = df.select(
        graft.functions.hash60(col("s")).as("h60"),
        graft.functions.l2_normalize(col("v")).as("nv"),
        graft.functions.sparse_l2_normalize(col("sp")).as("nsp"),
        graft.functions.minhash_signature(col("hs"),
          fam.map(_._1).toArray, fam.map(_._2).toArray, 2147483647L).as("mh"),
        graft.functions.simhash_bits(col("hs")).as("sh"),
        bridge.column(graft.functions.NearestCentroid(
          bridge.expression(col("v")), cents, "Euclidean")).as("nc"))
        .collect()
      assert(out.length == 2)
      assert(out(0).getInt(5) == 1) // (1,2,2) is its own centroid
      assert(out(1).getInt(5) == 0) // zero vector -> zero centroid
      val nv = out(0).getSeq[Float](1)
      assert(math.abs(nv.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
      assert(out(1).getSeq[Float](1) == Seq(0f, 0f, 0f)) // zero vector unchanged
      assert(out(0).getSeq[Long](3).length == 4)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("token_hashes_mod == transform(tokens, t -> pmod(hash60(t), P)) composed form") {
    import graft.pipeline.TextAnalysis
    val rnd = new scala.util.Random(5)
    val words = Vector("alpha", "beta", "Gamma", "x", "", "Ümlaut", "123")
    val strs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    } ++ Seq("", "   ", " leading", "trailing ", "tab\tinside", "\tleads")
    val df = strs.toDF("s")
    val p = 2147483647L
    val bad = df.select(
      graft.functions.token_hashes_mod(col("s"), p).as("fast"),
      transform(TextAnalysis.tokens(col("s")),
        t => pmod(graft.functions.hash60(t), lit(p))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("hash60 == conv(substr(md5,1,15),16,10)") {
    val rnd = new scala.util.Random(1)
    val strs = (0 until 200).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString) :+ ""
    val df = strs.toDF("s")
    val bad = df.select(
      graft.functions.hash60(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("minhash_signature == composed array_min(transform(...)) form") {
    val rnd = new scala.util.Random(2)
    val rows = (0 until 50).map(_ =>
      Tuple1((0 until rnd.nextInt(40)).map(_ => rnd.nextLong().abs % 2147483647L)))
    val df = rows.toDF("hs")
    val fam = Dedup.hashFamily(16)
    val composed = fam.map { case (a, b) =>
      when(size(col("hs")) === 0, lit(2147483647L))
        .otherwise(array_min(transform(col("hs"), h => pmod(h * a + b, lit(2147483647L)))))
    }
    val bad = df.select(
      graft.functions.minhash_signature(col("hs"),
        fam.map(_._1).toArray, fam.map(_._2).toArray, 2147483647L).as("fast"),
      array(composed: _*).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("simhash_bits == composed 60-aggregate form") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 50).map(_ =>
      Tuple1((0 until rnd.nextInt(40)).map(_ => rnd.nextLong().abs % (1L << 60))))
    val df = rows.toDF("hs")
    val bits = (0 until 60).map { i =>
      val vote = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + (shiftrightunsigned(h, i).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    val composed = when(size(col("hs")) === 0, lit(0L))
      .otherwise(bits.reduce((a, b) => a + b))
    val bad = df.select(graft.functions.simhash_bits(col("hs")).as("fast"),
      composed.as("ref")).filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }
}
