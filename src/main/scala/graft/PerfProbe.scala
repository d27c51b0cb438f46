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
