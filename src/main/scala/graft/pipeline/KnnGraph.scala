package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.types.MetricType

/** Full kNN-graph construction, bucketed (reference analog: the NSG
  * build's first phase is an approximate kNN graph over ALL rows,
  * engine/db/ann_graph_segment.cpp — there it is an in-memory NN-Descent;
  * here it is the cluster-bucketed join + bounded-heap aggregate that
  * survives 100 TB).
  *
  * Shape: every row is both a query and a candidate. The query side is
  * assigned to its `probes` nearest centroids (multi-probe for boundary
  * recall), the candidate side to its single home centroid; an equi-join
  * on cluster id generates only within-bucket pairs (NEVER the N² cross
  * join), and `topk_min` keeps one bounded heap per (query, task) so the
  * shuffle after scoring carries N·k pairs. Pair uniqueness is structural:
  * a candidate lives in exactly one home cluster, so a (q, n) pair
  * co-occurs at most once however many clusters q probes.
  *
  * Recall is the probe tradeoff exactly as in IVF search: probes =
  * nCentroids degenerates to the EXACT graph (every query meets every
  * candidate once — proven in KnnGraphSpec); fewer probes trade boundary
  * neighbors for a proportional scan cut. Bucketing geometry is the unit
  * sphere (assignments over l2-normalized vectors), which prunes by
  * cosine neighborhoods; the output distance is computed on the RAW
  * vectors under `metric`.
  *
  * Returns (qid, rank, nid, d), rank 1..k by (d asc, nid asc).
  */
object KnnGraph {

  def bucketed(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], k: Int, probes: Int = 2,
      metric: MetricType.Value = MetricType.Euclidean): DataFrame = {
    require(centroids.nonEmpty, "kNN graph needs at least one centroid")
    val assignedQ = Dedup.assignClusters(df, vecCol, idCol, centroids,
      math.min(probes, centroids.length))
      .select(col("cluster"), col("id").as("qid"), col("v").as("qv"))
    val assignedN = Dedup.assignClusters(df, vecCol, idCol, centroids, 1)
      .select(col("cluster"), col("id").as("nid"), col("v").as("nv"))
    assignedQ.join(assignedN, Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("d",
        graft.index.IvfIndex.distColumns(metric, col("qv"), col("nv")))
      .groupBy(col("qid"))
      .agg(graft.functions.topk_min(k, col("d"), col("nid")).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("nid"), col("hit.d").as("d"))
  }
}
