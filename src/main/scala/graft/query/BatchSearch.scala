package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.types._
import graft.functions._

/** Batch exact top-k: many query vectors answered in ONE corpus pass.
  *
  * The reference answers one query per request — its batch story is "send
  * N requests" (engine/server/web_server/web_controller.hpp:644-963), which
  * on Spark would mean N jobs, each a full scan. At 100 TB the job path
  * costs minutes per scan, so offline batch retrieval (dedup probes,
  * eval-set contamination sweeps, kNN-graph builds, hybrid reranks) must
  * amortize: score ALL queries against each row while it is hot in the
  * scan, keep one bounded heap per query per task ([[TopKMin]] partial
  * aggregation), and shuffle only Q·k·tasks candidate pairs — never the
  * N·Q scored pairs (the window-rank formulation) and never N rows per
  * query job (the sequential formulation).
  *
  * Plan shape:
  *   scan -> explode(literal query array) -> distance (codegen) ->
  *   ObjectHashAggregate[topk_min] partial -> exchange(Q groups) -> final
  *
  * The query array rides the plan as a foldable literal (no driver
  * collect, no broadcast table): Q·dim floats serialized once per task.
  * Practical Q is bounded by per-task heap memory — Q·16·k bytes of heap
  * plus Q distance evaluations per row; thousands of queries per pass are
  * fine, and larger query sets just chunk into ⌈Q/chunk⌉ passes.
  */
object BatchSearch {

  /** One query in a batch; `qid` labels its rows in the result. */
  case class BatchQuery(qid: Long, vector: Array[Float])

  /** Exact batch top-k over a dense vector column.
    *
    * Returns (qid, rank, id, d): for every query its k nearest ids under
    * `metric`, rank 1..k by (distance asc, id asc) — the engine's standard
    * tie-break. Cosine queries are normalized query-side; stored vectors
    * are expected pre-normalized at ingest, same contract as
    * [[QueryEngine.distanceColumn]].
    */
  def topK(table: DataFrame, vecCol: String, idCol: String,
      queries: Seq[BatchQuery], k: Int,
      metric: MetricType.Value = MetricType.Euclidean): DataFrame = {
    require(queries.nonEmpty, "batch search needs at least one query")
    val qarr = array(queries.map { q =>
      val qv = metric match {
        case MetricType.Cosine => normalize(q.vector)
        case _ => q.vector
      }
      struct(lit(q.qid).as("qid"), lit(qv).as("qv"))
    }: _*)
    val dist: Column = metric match {
      case MetricType.Euclidean => l2sqr_distance(col("v"), col("q.qv"))
      case MetricType.Cosine => lit(1.0) - dot_product(col("v"), col("q.qv"))
      case MetricType.DotProduct => negative_dot(col("v"), col("q.qv"))
    }
    table
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), explode(qarr).as("q"))
      .withColumn("d", dist)
      .groupBy(col("q.qid").as("qid"))
      .agg(topk_min(k, col("d"), col("id")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("id"), col("hit.d").as("d"))
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    if (acc == 0.0) v
    else { val inv = 1.0 / math.sqrt(acc); v.map(x => (x * inv).toFloat) }
  }
}
