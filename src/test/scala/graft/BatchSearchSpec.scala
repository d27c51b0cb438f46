package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.functions.TopKHeap
import graft.query.BatchSearch
import graft.query.BatchSearch.BatchQuery
import graft.types.MetricType

/** The bounded top-k aggregate + batch search operator. */
class BatchSearchSpec extends SparkSpec {
  import spark.implicits._

  // --- TopKHeap unit behavior (the aggregation buffer itself) ---

  test("heap keeps the k smallest with (d asc, id asc) tie-break") {
    val h = new TopKHeap(3)
    Seq((5.0, 1L), (1.0, 9L), (1.0, 2L), (3.0, 7L), (0.5, 4L), (9.0, 0L))
      .foreach { case (d, i) => h.offer(d, i) }
    assert(h.sortedPairs.toSeq == Seq((0.5, 4L), (1.0, 2L), (1.0, 9L)))
  }

  test("heap under capacity returns everything sorted; NaN never admitted") {
    val h = new TopKHeap(10)
    h.offer(2.0, 1L); h.offer(Double.NaN, 5L); h.offer(1.0, 3L)
    assert(h.sortedPairs.toSeq == Seq((1.0, 3L), (2.0, 1L)))
  }

  test("merge equals offering the union") {
    val rng = new scala.util.Random(42)
    val all = Seq.fill(500)((rng.nextInt(50).toDouble, rng.nextLong().abs))
    val (l, r) = all.splitAt(250)
    val a = new TopKHeap(16); l.foreach { case (d, i) => a.offer(d, i) }
    val b = new TopKHeap(16); r.foreach { case (d, i) => b.offer(d, i) }
    a.mergeFrom(b)
    val expected = all.distinct.sortBy { case (d, i) => (d, i) }.take(16)
    assert(a.sortedPairs.toSeq == expected)
  }

  // --- end-to-end through Spark (partial agg + shuffle + merge) ---

  private def bruteTopK(rows: Seq[(Long, Array[Float])], q: Array[Float], k: Int) =
    rows.map { case (id, v) =>
      val d = v.zip(q).map { case (a, b) => val x = a.toDouble - b.toDouble; x * x }.sum
      (d, id)
    }.sortBy(identity).take(k).map(_._2)

  private val rng = new scala.util.Random(7)
  private val corpus: Seq[(Long, Array[Float])] =
    (0L until 400L).map(i => (i, Array.fill(8)(rng.nextFloat())))

  test("batch topK equals per-query brute force on every query") {
    val df = corpus.toDF("vec_id", "embedding").repartition(7)
    val queries = (0 until 6).map(i => BatchQuery(100L + i, corpus(i * 13)._2))
    val got = BatchSearch.topK(df, "embedding", "vec_id", queries, k = 5)
      .orderBy($"qid", $"rank")
      .select($"qid", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queries.foreach { q =>
      assert(got(q.qid) == bruteTopK(corpus, q.vector, 5),
        s"mismatch for query ${q.qid}")
    }
  }

  test("k larger than the corpus returns all rows, still sorted") {
    val df = corpus.take(3).toDF("vec_id", "embedding")
    val out = BatchSearch.topK(df, "embedding", "vec_id",
      Seq(BatchQuery(0L, corpus.head._2)), k = 10).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  test("cosine batch matches the single-query engine ordering") {
    val df = corpus.toDF("vec_id", "embedding")
    val q = corpus(11)._2
    // engine single-query path: stored vectors NOT pre-normalized here, so
    // compare against the same 1 - dot(v, q̂) formulation batch uses
    val qn = { val n = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      q.map(x => (x / n).toFloat) }
    val expected = df
      .withColumn("d", lit(1.0) - graft.functions.dot_product($"embedding", lit(qn)))
      .orderBy($"d".asc, $"vec_id".asc).limit(5)
      .select($"vec_id").as[Long].collect().toSeq
    val got = BatchSearch.topK(df, "embedding", "vec_id",
      Seq(BatchQuery(1L, q)), k = 5, MetricType.Cosine)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(got == expected)
  }

  // --- plan shape: this is the operator's reason to exist ---

  test("batch plan is partial-agg over one scan: no window, no join, hash-agg topk") {
    val df = corpus.toDF("vec_id", "embedding").repartition(7)
    val queries = (0 until 6).map(i => BatchQuery(i.toLong, corpus(i)._2))
    val plan = BatchSearch.topK(df, "embedding", "vec_id", queries, k = 5)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("topk_min"), plan)
    // partial + final pair around one exchange — map-side heaps are the
    // whole point (shuffle carries Q·k·tasks pairs, not N·Q scored rows)
    assert("ObjectHashAggregate".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
