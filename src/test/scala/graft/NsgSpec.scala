package graft

import org.apache.spark.sql.functions._

import graft.index.NsgIndex

/** NSG graph refinement + serving (reference R2/V5): MRNG occlusion on a
  * hand-checkable line fixture, degree caps, connectivity from the
  * navigation point, exhaustive-search exactness at l = N, and the
  * save/load roundtrip. */
class NsgSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // one centroid => single bucket => the kNN stage is exact
  private val oneCentroid = Array(Array.fill(2)(0.0))

  test("MRNG occlusion on a line: long edges are occluded by the middle point") {
    // points 0,1,2 at x = 0,1,2: the 0--2 edge (d=4) is occluded by 1
    // (d(1,2)=1 < 4), so the refined graph is exactly the line
    val df = Seq((0L, vec(0, 0)), (1L, vec(1, 0)), (2L, vec(2, 0)))
      .toDF("id", "v")
    val g = NsgIndex.build(df, "v", "id", oneCentroid, knnK = 2,
      poolSize = 4, outDegree = 4)
    val adj = g.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adj == Set((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L)),
      s"expected the pruned line graph, got $adj")
    assert(g.navId == 1L, "navigation point must be the mean-nearest row")
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("degree caps hold and the graph is connected from the navigation point") {
    // 40 deterministic points on two well-separated rings — the bucketed
    // kNN (single centroid => exact) plus spurs must leave everything
    // reachable from the nav point, with out-degree <= cap (+ nav spurs)
    val pts = (0 until 40).map { i =>
      val ring = i % 2; val a = 2 * math.Pi * i / 40.0
      (i.toLong, vec(math.cos(a) + ring * 50.0, math.sin(a)))
    }
    val df = pts.toDF("id", "v")
    val g = NsgIndex.build(df, "v", "id", oneCentroid, knnK = 4,
      poolSize = 8, outDegree = 3)
    val adj = g.edges.collect().groupBy(_.getLong(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    val nonNav = adj.filter(_._1 != g.navId)
    assert(nonNav.forall(_._2.size <= 3 + 1), // +1 possible spur target
      s"degree cap broken: ${nonNav.filter(_._2.size > 4)}")
    // BFS from nav
    val seen = scala.collection.mutable.Set(g.navId)
    var frontier = Set(g.navId)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
      seen ++= frontier
    }
    assert(seen.size == 40, s"unreachable nodes: ${seen.size}/40")
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("serve at l = N is exact top-k; save/load roundtrips") {
    val pts = (0 until 60).map { i =>
      (i.toLong, vec((i * 37 % 61) / 10.0, (i * 17 % 53) / 10.0,
        (i * 7 % 41) / 10.0))
    }
    val df = pts.toDF("id", "v")
    val g = NsgIndex.build(df, "v", "id",
      Array(Array.fill(3)(0.0)), knnK = 6, poolSize = 12, outDegree = 4)
    val srv = NsgIndex.serve(g, df, "v", "id")
    def exact(q: Array[Float], k: Int): Seq[(Long, Double)] = pts
      .map { case (id, v) =>
        val d = v.zip(q).map { case (a, b) => (a - b) * (a - b) }
          .sum.toDouble
        (id, d)
      }
      .sortBy { case (id, d) => (d, id) }.take(k)
      .map { case (id, d) => (id, d) }
    for (q <- Seq(vec(1, 2, 3), vec(5.5, 0.1, 2.2), vec(0, 0, 0))) {
      val got = srv.search(q, 5, 60)
      val want = exact(q, 5)
      assert(got.map(_._1) == want.map(_._1),
        s"l=N walk not exact for ${q.toSeq}: $got vs $want")
    }
    // moderate l still returns k results with sane ordering
    val part = srv.search(vec(1, 1, 1), 5, 10)
    assert(part.size == 5 && part == part.sortBy(p => (p._2, p._1)))
    val dir = java.nio.file.Files.createTempDirectory("nsg_save").toString
    g.save(dir)
    val g2 = NsgIndex.NsgGraph.load(spark, dir)
    assert(g2.navId == g.navId && g2.outDegree == g.outDegree)
    val srv2 = NsgIndex.serve(g2, df, "v", "id")
    assert(srv2.search(vec(1, 2, 3), 5, 60) == srv.search(vec(1, 2, 3), 5, 60),
      "save/load serve drifted")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    graft.pipeline.StageCaches.unpersistAll()
  }

  test("serve load enforces the row budget") {
    val df = Seq((0L, vec(0, 0)), (1L, vec(1, 0)), (2L, vec(2, 0)))
      .toDF("id", "v")
    val g = NsgIndex.build(df, "v", "id", oneCentroid, knnK = 2,
      poolSize = 4, outDegree = 2)
    intercept[IllegalArgumentException] {
      NsgIndex.serve(g, df, "v", "id", maxRows = 2)
    }
    graft.pipeline.StageCaches.unpersistAll()
  }
}
