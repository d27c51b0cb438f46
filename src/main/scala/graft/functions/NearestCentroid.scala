package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.types.MetricType

/** argmin over a broadcast-small centroid set in one pass (the k-means
  * assignment step and the IVF probe-selection step). Replaces a
  * least()+when() chain that evaluated every centroid distance twice. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]],
    metricName: String) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val metric = MetricType.withName(metricName)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      metric match {
        case MetricType.Euclidean =>
          while (i < dim) {
            val x = a.getFloat(i).toDouble - cent(i)
            d += x * x; i += 1
          }
        case _ => // Cosine (pre-normalized) and DotProduct: -dot ordering
          var dot = 0.0
          while (i < dim) { dot += a.getFloat(i).toDouble * cent(i); i += 1 }
          d = -dot
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
