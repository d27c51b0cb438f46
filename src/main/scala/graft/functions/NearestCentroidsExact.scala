package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `probes` nearest centroids of an l2-normalized input, by L2² in
  * DOUBLE with strictly sequential sums — the arithmetic (normalize, then
  * (x−c)² accumulated in array order) mirrors the SQL-oracle formulation
  * `list_sum(list_transform(list_zip(nv, cv), p -> (p[1]-p[2])^2))`
  * bit-for-bit, so cluster assignments hash-match cross-engine. Ties
  * break toward the lower centroid index (the oracle's `ORDER BY dist,
  * cid`). Centroids are passed pre-normalized.
  *
  * This replaces a 16-way chain of interpreted `aggregate(zip_with(...))`
  * higher-order functions (measured ~11 s for 2k rows at sf0.1 — lambda
  * interpretation cost, not flops). */
case class NearestCentroidsExact(child: Expression,
    centroids: Array[Array[Double]], probes: Int) extends UnaryExpression {
  override def prettyName: String = "nearest_centroids_exact"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val flat: Array[Double] = centroids.flatten
  @transient private lazy val dim: Int =
    if (centroids.isEmpty) 0 else centroids(0).length

  override def nullSafeEval(v: Any): Any =
    NearestCentroidsExact.topProbes(v.asInstanceOf[ArrayData], flat, dim, probes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NearestCentroidsExact$$.MODULE$$
         |  .topProbes($c, $flatRef, $dim, $probes);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroidsExact {
  def topProbes(a: ArrayData, flat: Array[Double], dim: Int, probes: Int): ArrayData = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    val vd = new Array[Double](n)
    i = 0
    while (i < n) { vd(i) = a.getFloat(i).toDouble / norm; i += 1 }
    val k = if (dim == 0) 0 else flat.length / dim
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      var d = 0.0
      var j = 0
      val off = c * dim
      while (j < n) { val t = vd(j) - flat(off + j); d += t * t; j += 1 }
      dists(c) = d
      c += 1
    }
    val m = math.min(probes, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      c = 0
      while (c < k) {
        if (!used(c) && dists(c) < bestD) { bestD = dists(c); best = c }
        c += 1
      }
      if (best < 0) { // all remaining NaN: take the first unused, cid order
        c = 0
        while (best < 0 && c < k) { if (!used(c)) best = c; c += 1 }
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}
