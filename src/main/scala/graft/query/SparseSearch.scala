package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse-vector top-K at corpus scale: the inverted-list plan.
  *
  * The reference scores a sparse query with a per-row merge-join over
  * every row's (indices, values) pairs (engine/db/vector.cpp:7-100) — an
  * O(n · nnz) scan. The shared-nothing formulation explodes only the
  * NONZERO (dim, value) postings, joins them against the query's few
  * nonzero dims (broadcast), and sums partial products per row id:
  * cost is |postings of the query's dims|, not n × dim. At 100 TB the
  * exploded posting table IS the sparse index — pre-materialize it
  * partitioned/bucketed by dim and the per-query scan prunes to the
  * query's dimensions only (the batch analog of an inverted index).
  */
object SparseSearch {

  /** Posting list (id, dim, v) from a sparse struct column — narrow
    * explode, no shuffle. Pre-materialize for repeated serving. */
  def postings(df: DataFrame, sparseCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(arrays_zip(
          col(sparseCol).getField("indices").as("dim"),
          col(sparseCol).getField("values").as("v"))).as("p"))
      .select(col("id"), col("p.dim").as("dim"), col("p.v").as("v"))

  /** Top-K row ids by dot product with a sparse query, highest first,
    * ties broken by id — one broadcast equi-join on dim + one
    * partial-aggregated groupBy(id), then TakeOrderedAndProject. */
  def topKDot(df: DataFrame, sparseCol: String, idCol: String,
      qIdx: Array[Int], qVal: Array[Float], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = qIdx.zip(qVal).toSeq.toDF("dim", "qval")
    postings(df, sparseCol, idCol)
      .join(broadcast(q), "dim")
      .groupBy(col("id"))
      .agg(sum(col("v") * col("qval")).as("dot"))
      .orderBy(col("dot").desc, col("id").asc)
      .limit(k)
  }
}
