package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.types.MetricType

/** argmin over a broadcast-small centroid set in one pass (the k-means
  * assignment step and the IVF probe-selection step). Replaces a
  * least()+when() chain that evaluated every centroid distance twice.
  *
  * Codegen'd (addReferenceObj + static kernel call, same shape as
  * NearestCentroidsExact): this is the per-row kernel of BOTH the index
  * build's assign-only full pass and the incremental append — the hottest
  * loop at build time, so it must stay inside whole-stage codegen rather
  * than paying interpreted boxing per row. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]],
    metricName: String) extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val metric = MetricType.withName(metricName)
  // flat row-major centroid matrix for cache locality; |c|^2 precomputed so
  // the Euclidean argmin reduces to argmin(|c|^2 - 2 x·c) — one fused dot
  // loop per centroid, |x|^2 never needed
  @transient private lazy val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      var i = 0
      while (i < dim) { out(c * dim + i) = centroids(c)(i); i += 1 }
      c += 1
    }
    out
  }
  @transient private lazy val norms: Array[Double] = centroids.map { cent =>
    var s = 0.0; var i = 0
    while (i < cent.length) { s += cent(i).toDouble * cent(i); i += 1 }
    s
  }
  @transient private lazy val euclidean = metric == MetricType.Euclidean

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.assign(v.asInstanceOf[ArrayData], flat, norms, dim, euclidean)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NearestCentroid$$.MODULE$$
         |  .assign($c, $flatRef, $normsRef, $dim, $euclidean);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroid {
  def assign(a: ArrayData, flat: Array[Double], norms: Array[Double],
      dim: Int, euclidean: Boolean): Int = {
    val n = a.numElements()
    val k = norms.length
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    var off = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      val m = if (n < dim) n else dim
      while (i < m) { dot += a.getFloat(i).toDouble * flat(off + i); i += 1 }
      val d = if (euclidean) norms(c) - 2.0 * dot else -dot
      if (d < bestD) { bestD = d; best = c }
      c += 1
      off += dim
    }
    best
  }
}
