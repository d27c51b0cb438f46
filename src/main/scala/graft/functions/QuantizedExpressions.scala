package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 affine quantization kernels (the storage lever for vector scans at
  * 100 TB — the float32 column shrinks 4x; scan-then-rerank recovers exact
  * results). Codes are packed into ONE binary value per vector (a true
  * byte per dimension in parquet, vs array<int> which stores each code as
  * an annotated INT32 chunk), plus two doubles of affine scale.
  *
  * The affine form `q = floor((x-mn)/(mx-mn)*255 + 0.5)` and its inverse
  * `mn + q*(mx-mn)/255` use explicit floor(y+0.5) rounding so a SQL oracle
  * reproduces the math bit-for-bit (see Quantize.quantizeI8).
  *
  * Beyond-reference addition: the reference keeps all vectors float32 in
  * RAM (table_segment_mvp.cpp:106-111). */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_vec"
  override def dataType: DataType = QuantizeVec.outType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    QuantizeVec.encode(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeVec$$.MODULE$$.encode($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object QuantizeVec {
  val outType: StructType = StructType(Seq(
    StructField("qmin", DoubleType, nullable = false),
    StructField("qmax", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  def encode(a: ArrayData): InternalRow = {
    val n = a.numElements()
    if (n == 0) return InternalRow(0.0, 0.0, Array.emptyByteArray)
    var mn = Double.MaxValue
    var mx = Double.MinValue
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val codes = new Array[Byte](n)
    if (mx != mn) {
      // operation order mirrors the SQL oracle exactly:
      // floor((x - mn) / (mx - mn) * 255.0 + 0.5)
      val range = mx - mn
      i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        codes(i) = math.floor((x - mn) / range * 255.0 + 0.5).toInt.toByte
        i += 1
      }
    }
    InternalRow(mn, mx, codes)
  }
}

/** Squared L2 between the DEQUANTIZED codes and a full-precision query —
  * the quantized-scan kernel: one fused loop, no per-element lambda
  * interpretation (replaces the `aggregate(zip_with(...))` HOF chain,
  * which pays closure dispatch per element on the hot path). */
case class QuantizedL2(first: Expression, second: Expression, third: Expression,
    query: Array[Double]) extends TernaryExpression {
  override def prettyName: String = "quantized_l2"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, mn: Any, mx: Any): Any =
    QuantizedL2.dist(codes.asInstanceOf[Array[Byte]],
      mn.asInstanceOf[Double], mx.asInstanceOf[Double], query)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("quantQuery", query, "double[]")
    nullSafeCodeGen(ctx, ev, (c, mn, mx) =>
      s"""${ev.value} = graft.functions.QuantizedL2$$.MODULE$$
         |  .dist($c, $mn, $mx, $qRef);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object QuantizedL2 {
  def dist(codes: Array[Byte], mn: Double, mx: Double, q: Array[Double]): Double = {
    // dequantize order mirrors the SQL oracle: mn + q * (mx - mn) / 255.0
    // (i.e. ((q * range) / 255), NOT q * (range / 255) — ulp differences
    // would break the cross-engine hash match)
    val range = mx - mn
    var acc = 0.0
    var i = 0
    val n = if (codes.length < q.length) codes.length else q.length
    while (i < n) {
      val d = mn + (codes(i) & 0xff) * range / 255.0 - q(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
