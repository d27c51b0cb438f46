package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NSG graph refinement + graph serving — the reference's R2/V5 surface
  * (reference: engine/db/index/nsg/nsg.cpp:45-775 — SyncPrune/SelectEdge
  * out_degree 50 / pool 300, InterInsert reverse edges, CheckConnectivity
  * + spur edges, navigation point nearest the centroid;
  * engine/db/execution/vec_search_executor.cpp:297-715 — bounded-queue
  * best-first search from the navigation point), re-split for Spark:
  *
  *  - BUILD is DISTRIBUTED. The reference's sequential per-node
  *    search-on-the-partial-graph candidate pools become the one-hop
  *    neighbor expansion over the bucketed kNN graph (neighbors ∪
  *    neighbors-of-neighbors, distance-capped to the pool size) — the
  *    NN-Descent/Vamana-style batch approximation of the same pool; the
  *    MRNG occlusion rule (`SelectEdge`: keep candidate c unless some
  *    kept edge s has d(s,c) < d(q,c)) then runs per node over its own
  *    pool — embarrassingly parallel. Reverse edges are a union +
  *    per-node distance-capped re-prune (InterInsert's batch form), and
  *    connectivity is pointer-jumping components + spur edges from the
  *    navigation point to each orphan component (CheckConnectivity's
  *    batch form). Every stage is a join/aggregate; nothing walks
  *    pointers at build time.
  *  - SERVING is the DRIVER-RESIDENT bounded-queue best-first walk —
  *    the reference's own regime (a single-node in-memory engine), and
  *    this repo's existing serve-tier contract (byte/row-capped loads,
  *    exact (d, id) tie-breaks). The DISTRIBUTED search path remains
  *    IVF (IvfIndex.scala:9-48 rationale): a graph walk is
  *    pointer-chasing, the one access pattern a shared-nothing scan
  *    engine cannot do cheaply — NSG here closes the reference's graph
  *    refinement + single-node graph search semantics, not the 100 TB
  *    scan path.
  *
  * Distances are L2² throughout (monotone with L2 — same ordering), the
  * reference NSG's metric. Ties break by id everywhere.
  */
object NsgIndex {

  /** A built NSG: adjacency (src, dst, d) with out-degree ≤ `outDegree`
    * (+ navigation spurs), and the navigation point. */
  final case class NsgGraph(edges: DataFrame, navId: Long,
      outDegree: Int, poolSize: Int, knnK: Int) {
    def save(dir: String): Unit = {
      val spark = edges.sparkSession
      edges.write.mode("overwrite").parquet(s"$dir/edges.parquet")
      import spark.implicits._
      Seq((navId, outDegree, poolSize, knnK))
        .toDF("nav_id", "out_degree", "pool_size", "knn_k")
        .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    }
  }

  object NsgGraph {
    def load(spark: SparkSession, dir: String): NsgGraph = {
      val m = spark.read.parquet(s"$dir/meta.parquet").head()
      NsgGraph(spark.read.parquet(s"$dir/edges.parquet"),
        m.getAs[Long]("nav_id"), m.getAs[Int]("out_degree"),
        m.getAs[Int]("pool_size"), m.getAs[Int]("knn_k"))
    }
  }

  private def l2sqr(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** One node's candidate pool, vectors included (the MRNG selection
    * input). */
  final case class PoolEntry(cand: Long, d: Double, cv: Array[Float])
  final case class NodePool(qid: Long, pool: Seq[PoolEntry])

  /** Distributed NSG build over a vector table. `centroids` seed the
    * bucketed kNN join (the same fixed-or-fitted centroids the kNN-graph
    * and embedding-dedup operators take). Reference defaults: out_degree
    * 50, pool 300, kNN K 100 (ann_graph_segment.cpp:28-29, knn.hpp:91). */
  def build(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], knnK: Int = 100,
      poolSize: Int = 300, outDegree: Int = 50,
      probes: Int = 2): NsgGraph = {
    require(outDegree >= 1 && poolSize >= outDegree && knnK >= 1,
      "need 1 <= outDegree <= poolSize and knnK >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val __dbg = sys.env.contains("SPARK_GRAFT_NSG_TIMINGS")
    var __t = System.nanoTime()
    def __lap(l: String): Unit = if (__dbg) {
      val now = System.nanoTime()
      println(f"[nsg] $l%-28s ${(now - __t) / 1e9}%.2f s"); __t = now
    }

    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"))
    // 1. bucketed kNN graph (qid, nid, d) — the distributed pool seed
    val knn = graft.pipeline.KnnGraph.bucketed(df, vecCol, idCol,
        centroids, knnK, probes)
      .select(col("qid").cast("long").as("qid"),
        col("nid").cast("long").as("nid"), col("d"))
      .cache().transform(graft.pipeline.StageCaches.track)
    __lap("knn graph define")
    // 2. candidate pools: neighbors ∪ neighbors-of-neighbors, distances
    //    recomputed against the query vector, capped to poolSize by the
    //    bounded-heap aggregate (one heap per (qid, task))
    val twoHop = knn.select(col("qid"), col("nid").as("mid"))
      .join(knn.select(col("qid").as("mid"), col("nid").as("cand")), "mid")
      .select(col("qid"), col("cand"))
      .filter(col("qid") =!= col("cand"))
    val candIds = knn.select(col("qid"), col("nid").as("cand"))
      .unionByName(twoHop).distinct()
    val pooled = candIds
      .join(vecs.select(col("id").as("qid"), col("v").as("qv")), "qid")
      .join(vecs.select(col("id").as("cand"), col("v").as("cv")), "cand")
      .withColumn("d", graft.index.IvfIndex.distColumns(
        graft.types.MetricType.Euclidean, col("qv"), col("cv")))
      .groupBy(col("qid"))
      .agg(graft.functions.topk_min(poolSize, col("d"), col("cand")).as("topk"))
      .select(col("qid"), explode(col("topk")).as("hit"))
      .select(col("qid"), col("hit.id").as("cand"), col("hit.d").as("d"))
    // 3. per-node MRNG occlusion (SelectEdge): needs candidate vectors —
    //    join them back, group the pool per node, select edges locally
    //    (pool ≤ poolSize rows per node; parallel across nodes)
    val deg = outDegree // capture the plain Int, not `this`
    val fwdCapped = pooled
      .join(vecs.select(col("id").as("cand"), col("v").as("cv")), "cand")
      .groupBy(col("qid"))
      .agg(collect_list(struct(col("cand"), col("d"), col("cv"))).as("pool"))
      .as[NodePool]
      .flatMap { np =>
        val sorted = np.pool.sortBy(p => (p.d, p.cand))
        val kept = scala.collection.mutable.ArrayBuffer.empty[PoolEntry]
        val it = sorted.iterator
        while (kept.size < deg && it.hasNext) {
          val c = it.next()
          if (!kept.exists(s => l2sqr(s.cv, c.cv) < c.d)) kept += c
        }
        kept.map(e => (np.qid, e.cand, e.d))
      }.toDF("src", "dst", "d")
    // 4. reverse-edge insert (InterInsert batch form): union the
    //    transposed edges, then re-cap per node by distance
    val undirected = fwdCapped.unionByName(
        fwdCapped.select(col("dst").as("src"), col("src").as("dst"), col("d")))
      .groupBy(col("src"), col("dst")).agg(min(col("d")).as("d"))
    val capped = undirected
      .groupBy(col("src"))
      .agg(graft.functions.topk_min(outDegree, col("d"), col("dst")).as("topk"))
      .select(col("src"), explode(col("topk")).as("hit"))
      .select(col("src"), col("hit.id").as("dst"), col("hit.d").as("d"))
      .cache().transform(graft.pipeline.StageCaches.track)
    __lap("stages defined (lazy)")
    // 5. navigation point: the row nearest the corpus mean vector
    val dim = vecs.select(size(col("v"))).head().getInt(0)
    __lap("dim head")
    val mean = vecs.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x")).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1).toFloat)
    require(mean.length == dim, "ragged vector column")
    __lap("mean collect")
    val navId = vecs
      .withColumn("d", graft.index.IvfIndex.distColumns(
        graft.types.MetricType.Euclidean, col("v"), lit(mean)))
      .orderBy(col("d").asc, col("id").asc).select(col("id"))
      .head().getLong(0)
    __lap("navId head")
    // 6. connectivity (CheckConnectivity batch form): components of the
    //    undirected edge set by min-label propagation; every component
    //    that misses the navigation point gets a bidirectional spur
    //    between the nav point and the component's canonical min-id node
    val comps = graft.pipeline.Dedup.duplicateClusters(
      capped.select(col("src").as("id_a"), col("dst").as("id_b")))
    __lap("components (capped materializes)")
    val navComp = comps.filter(col("id") === navId)
      .select(col("cluster")).head().getLong(0)
    val orphanReps = comps.filter(col("cluster") =!= navComp)
      .select(col("cluster")).distinct()
      .collect().map(_.getLong(0)) // one row per orphan component
    __lap("navComp+orphans")
    val spurs = if (orphanReps.isEmpty) capped.limit(0) else {
      val navV = vecs.filter(col("id") === navId).select(col("v"))
        .head().getSeq[Float](0).toArray
      val repVs = vecs.filter(col("id").isin(orphanReps.map(Long.box): _*))
        .select(col("id"), col("v")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      repVs.flatMap { case (rep, rv) =>
        val d = l2sqr(navV, rv)
        Seq((navId, rep, d), (rep, navId, d))
      }.toSeq.toDF("src", "dst", "d")
    }
    val edges = capped.unionByName(spurs)
      .groupBy(col("src"), col("dst")).agg(min(col("d")).as("d"))
    NsgGraph(edges, navId, outDegree, poolSize, knnK)
  }

  /** Driver-resident NSG serving — the reference's bounded-queue
    * best-first walk (vec_search_executor.cpp:297-715), single-threaded
    * deterministic form: seed with the navigation point, repeatedly
    * expand the nearest unexpanded candidate within the top-`l` window,
    * stop when the window is fully expanded; ties break by id at every
    * step. `l` (the reference's search_length) trades recall for visited
    * nodes; at l ≥ N the walk visits every reachable node, and with the
    * build's connectivity spurs that is the whole graph — exact top-k. */
  final class Serve(adjacency: java.util.HashMap[Long, Array[Long]],
      vectors: java.util.HashMap[Long, Array[Float]], val navId: Long) {
    def size: Int = vectors.size

    def search(q: Array[Float], k: Int, l: Int): Seq[(Long, Double)] = {
      require(k >= 1 && l >= k, "need 1 <= k <= l")
      val visited = new java.util.HashSet[Long]()
      // candidates ordered by (d, id); expanded flags held separately
      val cmp = new java.util.Comparator[(Double, Long)] {
        def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
      val order = new java.util.TreeMap[(Double, Long), Unit](cmp)
      val expanded = new java.util.HashSet[Long]()
      def push(id: Long): Unit = if (visited.add(id)) {
        val v = vectors.get(id)
        if (v != null) order.put((l2sqr(q, v), id), ())
      }
      push(navId)
      var done = false
      while (!done) {
        // nearest unexpanded within the top-l window
        val it = order.keySet().iterator()
        var i = 0
        var next = -1L
        while (next < 0 && i < l && it.hasNext) {
          val (_, id) = it.next()
          if (!expanded.contains(id)) next = id
          i += 1
        }
        if (next < 0) done = true
        else {
          expanded.add(next)
          val ns = adjacency.get(next)
          if (ns != null) { var j = 0; while (j < ns.length) { push(ns(j)); j += 1 } }
          // keep the frontier bounded: drop entries past the window
          while (order.size() > math.max(l, k) * 4) order.pollLastEntry()
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val it = order.keySet().iterator()
      while (it.hasNext && out.size < k) {
        val (d, id) = it.next(); out += ((id, d))
      }
      out.toSeq
    }
  }

  /** Load a built graph for serving, under the serve tier's row budget
    * (the same bounded-driver-load contract as IVF serving). */
  def serve(graph: NsgGraph, df: DataFrame, vecCol: String, idCol: String,
      maxRows: Long = 4L * 1024 * 1024): Serve = {
    val vecs = df.select(col(idCol).cast("long"), col(vecCol))
    val n = vecs.count()
    require(n <= maxRows,
      s"NSG serve load of $n rows exceeds the $maxRows-row budget")
    val vm = new java.util.HashMap[Long, Array[Float]](n.toInt * 2)
    vecs.collect().foreach(r =>
      vm.put(r.getLong(0), r.getSeq[Float](1).toArray))
    val am = new java.util.HashMap[Long, Array[Long]]()
    graph.edges.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("ns"))
      .collect().foreach { r =>
        am.put(r.getLong(0), r.getSeq[Long](1).sorted.toArray)
      }
    new Serve(am, vm, graph.navId)
  }
}
