package graft

import org.apache.spark.sql.functions._
import graft.pipeline.KnnGraph
import graft.types.MetricType

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(19)
  // clustered geometry: 6 latent centers, small noise
  private lazy val corpus = (0L until 360L).map { i =>
    val c = (i % 6).toInt
    (i, Array.tabulate(12)(j =>
      (math.sin(c * 7 + j) * 3).toFloat + rng.nextFloat() * 0.2f))
  }
  private lazy val df = corpus.toDF("vec_id", "embedding")

  private def centroidsOf(k: Int): Array[Array[Double]] =
    corpus.take(k).map { case (_, v) =>
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      d.map(_ / n)
    }.toArray

  private def exactGraph(k: Int): Map[Long, Seq[Long]] =
    corpus.map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid).map { case (nid, nv) =>
        val d = qv.zip(nv).map { case (a, b) =>
          val x = a.toDouble - b.toDouble; x * x }.sum
        (d, nid)
      }.sortBy(identity).take(k).map(_._2).toSeq
    }.toMap

  test("probes = nCentroids degenerates to the exact graph") {
    val cents = centroidsOf(8)
    val got = KnnGraph.bucketed(df, "embedding", "vec_id", cents, k = 4,
        probes = cents.length)
      .orderBy($"qid", $"rank").select($"qid", $"nid").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val exact = exactGraph(4)
    corpus.foreach { case (qid, _) =>
      assert(got(qid) == exact(qid), s"query $qid differs from exact graph")
    }
  }

  test("multi-probe recall on clustered data is high; single-probe is a subset trade") {
    val cents = centroidsOf(8)
    val exact = exactGraph(4)
    def recallAt(probes: Int): Double = {
      val got = KnnGraph.bucketed(df, "embedding", "vec_id", cents, k = 4,
          probes = probes)
        .select($"qid", $"nid").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      corpus.map { case (qid, _) =>
        exact(qid).toSet.intersect(got.getOrElse(qid, Set.empty)).size / 4.0
      }.sum / corpus.size
    }
    val r2 = recallAt(2); val r1 = recallAt(1)
    assert(r2 >= 0.9, s"probes=2 recall $r2 below 0.9")
    assert(r2 >= r1, s"more probes must not lose recall ($r1 -> $r2)")
  }

  test("plan: equi-join on cluster, heap aggregate, no cartesian/window") {
    val cents = centroidsOf(8)
    val plan = KnnGraph.bucketed(df, "embedding", "vec_id", cents, k = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("topk_min"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("cosine metric orders by 1 - dot on pre-normalized vectors") {
    val unit = corpus.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      (id, v.map(x => (x / n).toFloat))
    }
    val udf2 = unit.toDF("vec_id", "embedding")
    val cents = centroidsOf(6)
    val got = KnnGraph.bucketed(udf2, "embedding", "vec_id", cents, k = 3,
        probes = cents.length, metric = MetricType.Cosine)
      .orderBy($"qid", $"rank").select($"qid", $"nid").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val exact = unit.map { case (qid, qv) =>
      qid -> unit.filter(_._1 != qid).map { case (nid, nv) =>
        val dot = qv.zip(nv).map { case (a, b) => a.toDouble * b.toDouble }.sum
        (1.0 - dot, nid)
      }.sortBy(identity).take(3).map(_._2).toSeq
    }.toMap
    unit.foreach { case (qid, _) =>
      assert(got(qid) == exact(qid), s"cosine query $qid differs")
    }
  }
}
