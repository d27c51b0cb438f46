package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{col, lit, struct}
import graft.functions._

/** F7: distance-function identities (reference: engine/test/engine/db/
  * vector.cpp:14-81) as property tests over the Spark expressions. */
class DistanceSpec extends SparkSpec {

  private def evalSparse(distFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column,
      v1: (Seq[Int], Seq[Float]), v2: (Seq[Int], Seq[Float])): Double = {
    val schema = StructType(Seq(
      StructField("a", graft.functions.SparseVec.sqlType),
      StructField("b", graft.functions.SparseVec.sqlType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row(v1._1, v1._2), Row(v2._1, v2._2))), schema)
    df.select(distFn(col("a"), col("b")).as("d")).head().getDouble(0)
  }

  test("sparse cosine distance = 1 - cos(theta) over the unit circle") {
    val v1 = (Seq(0, 1), Seq(1.0f, 0.0f))
    (0 until 360).foreach { step =>
      val theta = 2 * math.Pi * step / 360.0
      val scale = (step + 1).toFloat
      val v2 = (Seq(0, 1), Seq((math.cos(theta) * scale).toFloat, (math.sin(theta) * scale).toFloat))
      val got = evalSparse(sparse_cosine_distance, v1, v2)
      assert(math.abs(got - (1 - math.cos(theta))) < 1e-5, s"step $step: got $got")
    }
  }

  test("sparse dot distance = -(x+y)") {
    val ones = (Seq(0, 1), Seq(1.0f, 1.0f))
    (0 until 360).foreach { step =>
      val theta = 2 * math.Pi * step / 360.0
      val x = (math.cos(theta) * (step + 1)).toFloat
      val y = (math.sin(theta) * (step + 1)).toFloat
      val got = -evalSparse(sparse_dot, ones, (Seq(0, 1), Seq(x, y)))
      assert(math.abs(got - (-(x + y).toDouble)) < 1e-4, s"step $step")
    }
  }

  test("sparse l2 = sqrt((x-1)^2 + y^2)") {
    val v1 = (Seq(0, 1), Seq(1.0f, 0.0f))
    (0 until 360).foreach { step =>
      val theta = 2 * math.Pi * step / 360.0
      val x = (math.cos(theta) * (step + 1)).toFloat
      val y = (math.sin(theta) * (step + 1)).toFloat
      val got = evalSparse(sparse_l2sqr_distance, v1, (Seq(0, 1), Seq(x, y)))
      val want = (x - 1.0) * (x - 1.0) + y.toDouble * y
      assert(math.abs(got - want) < math.max(1e-3, want * 1e-5), s"step $step: $got vs $want")
    }
  }

  test("disjoint-index sparse l2sqr({0:1},{1:1,2:1,3:1}) = 4") {
    val got = evalSparse(sparse_l2sqr_distance,
      (Seq(0), Seq(1.0f)), (Seq(1, 2, 3), Seq(1.0f, 1.0f, 1.0f)))
    assert(got == 4.0)
  }

  test("sparse normalize({0:5,1:0}) = {0:1,1:0}") {
    val schema = StructType(Seq(StructField("a", graft.functions.SparseVec.sqlType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row(Seq(0, 1), Seq(5.0f, 0.0f)))), schema)
    val r = df.select(sparse_l2_normalize(col("a")).as("n")).head().getStruct(0)
    assert(r.getSeq[Float](1) == Seq(1.0f, 0.0f))
  }

  test("dense expressions match scalar math (random vectors)") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { _ =>
      val n = 1 + rnd.nextInt(16)
      val a = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      val df = spark.range(1).select(
        l2sqr_distance(lit(a), lit(b)).as("l2"),
        dot_product(lit(a), lit(b)).as("dot"),
        cosine_distance(lit(a), lit(b)).as("cos"))
      val r = df.head()
      val wantL2 = a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      val wantDot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      assert(math.abs(r.getDouble(0) - wantL2) < 1e-10)
      assert(math.abs(r.getDouble(1) - wantDot) < 1e-10)
      assert(math.abs(r.getDouble(2) - (1 - wantDot / (na * nb))) < 1e-10)
    }
  }

  test("l2_normalize produces unit vectors; zero vector passes through") {
    val df = spark.range(1).select(
      l2_normalize(lit(Array(3.0f, 4.0f))).as("n"),
      l2_normalize(lit(Array(0.0f, 0.0f))).as("z"))
    val r = df.head()
    assert(r.getSeq[Float](0) == Seq(0.6f, 0.8f))
    assert(r.getSeq[Float](1) == Seq(0.0f, 0.0f))
  }

  test("haversine: quarter meridian ~ 10007.5 km on 6371-sphere") {
    val d = spark.range(1)
      .select(haversine_km(lit(0.0), lit(0.0), lit(90.0), lit(0.0)).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 6371.0 * math.Pi / 2) < 1e-6)
  }
}
