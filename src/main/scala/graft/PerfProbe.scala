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
