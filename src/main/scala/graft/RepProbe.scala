package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Scratch probe: where does repetitionSignals' time go at sf0.1?
  * Times each signal column in isolation plus partitioning variants. */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(s"docs=${docs.count()} inputParts=${docs.rdd.getNumPartitions}")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val full = TextAnalysis.repetitionSignals(docs)
    val cols = Seq("dup_line_frac", "dup_line_char_frac", "top_bigram_frac",
      "dup_trigram_frac", "adj_dup_frac")
    for (c <- cols) time(c) {
      full.select(sum(col(c))).head()
    }
    time("all 5") { full.select(cols.map(c => sum(col(c))): _*).head() }
    time("all 5 repart32") {
      TextAnalysis.repetitionSignals(docs.repartition(32))
        .select(cols.map(c => sum(col(c))): _*).head()
    }
    spark.stop()
  }
}
