package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` must be deterministic (fully ordered output,
  * doubles rounded) because the driver hash-compares the result against the
  * DuckDB oracle in `oracleSql` run on the same parquet tables.
  */
object SparkEntry {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Exact top-K cosine search over the embeddings table with a filter —
    * the reference's core query shape (SURVEY §2.3). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = table(spark, dir, "embeddings")
    val q = queryVectorOf(spark, dir)
    emb.filter(col("label") >= 2)
      .withColumn("@distance", cosine_distance(col("embedding"), lit(q)))
      .orderBy(col("@distance").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("label"), col("@distance"))
  }

  private val qvCache = scala.collection.concurrent.TrieMap[String, Array[Float]]()

  /** The deterministic query vector used by vector-search queries: the
    * embedding of vec_id 0 of the scale factor under test (cached per SF —
    * many queries share it). The oracle SQL mirrors it with a scalar
    * subquery. */
  def queryVectorOf(spark: SparkSession, dir: String): Array[Float] =
    qvCache.getOrElseUpdate(dir,
      table(spark, dir, "embeddings")
        .filter(col("vec_id") === 0)
        .select(col("embedding"))
        .head().getSeq[Float](0).toArray)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesPipeline.all ++ QueriesStore.all

  def oracleSql: Map[String, String] =
    Queries.oracle ++ QueriesPipeline.oracle ++ QueriesStore.oracle
}
