package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (see graft.index.PqCodebook for the tier's
  * role). Both are codegen'd the same way as NearestCentroid: the codebook /
  * lookup table rides into generated code via addReferenceObj (a 1 MB float
  * array must NEVER be inlined as a literal — it would blow the 64 KB
  * method limit and defeat codegen entirely), and the per-row work is a
  * static kernel call, so the scan stays inside whole-stage codegen. */

/** Encode a float vector to `m` PQ code bytes (one parquet BINARY per row).
  * Build-time only — one pass during the same assign-and-write job that
  * computes the int8 codes. */
case class PqEncode(child: Expression, dim: Int, m: Int, ksub: Int,
    cents: Array[Float]) extends UnaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  private val dsub = dim / m
  // flat doubles + per-centroid norms: argmin(|c|^2 - 2 x.c) — one fused
  // dot per centroid, |x|^2 constant within a subspace so never needed
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) { out(i) = cents(i); i += 1 }
    out
  }
  @transient private lazy val norms: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var c = 0
    while (c < m * ksub) {
      var acc = 0.0
      var j = 0
      while (j < dsub) { val x = cents(c * dsub + j).toDouble; acc += x * x; j += 1 }
      out(c) = acc
      c += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    PqEncode.encode(v.asInstanceOf[ArrayData], flat, norms, m, dsub, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.PqEncode$$.MODULE$$
         |  .encode($c, $flatRef, $normsRef, $m, $dsub, $ksub);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqEncode {
  def encode(a: ArrayData, flat: Array[Double], norms: Array[Double],
      m: Int, dsub: Int, ksub: Int): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      val vOff = sub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cOff = (sub * ksub + c) * dsub
        var dot = 0.0
        var j = 0
        while (j < dsub) {
          val x = if (vOff + j < n) a.getFloat(vOff + j).toDouble else 0.0
          dot += x * flat(cOff + j)
          j += 1
        }
        val d = norms(sub * ksub + c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }
}

/** ADC score of a PQ code column against a per-query lookup table:
  * `m` array reads per row — the cheapest possible candidate scan (the
  * float column never leaves parquet). */
case class PqAdc(child: Expression, m: Int, ksub: Int, lut: Array[Double])
    extends UnaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqAdc.score(v.asInstanceOf[Array[Byte]], lut, m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.PqAdc$$.MODULE$$
         |  .score($c, $lutRef, $m, $ksub);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqAdc {
  def score(codes: Array[Byte], lut: Array[Double], m: Int, ksub: Int): Double = {
    var acc = 0.0
    var sub = 0
    val n = if (codes.length < m) codes.length else m
    while (sub < n) { acc += lut(sub * ksub + (codes(sub) & 0xff)); sub += 1 }
    acc
  }
}

/** Per-row PQ reconstruction error ‖x − x̂‖₂ from the float vector and its
  * already-computed codes — the one extra number that makes the PQ tier
  * PROVABLE: for L2, |d(q,x) − d(q,x̂)| ≤ ‖x−x̂‖ (triangle inequality); for
  * dot/cosine, |q·x − q·x̂| ≤ ‖q‖₂·‖x−x̂‖ (Cauchy–Schwarz). Build persists
  * it next to the codes; the quantized serving tier certifies top-k
  * boundaries against it (IvfIndex.servePointPqDetail). Reading the codes
  * instead of re-running the argmin keeps this pass at O(dim) per row —
  * subexpression elimination already shares the PqEncode result in the
  * build projection, and appends reuse the frozen codebook the same way. */
case class PqRecErr(left: Expression, right: Expression, dim: Int, m: Int,
    ksub: Int, cents: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "pq_rec_err"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private val dsub = dim / m
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) { out(i) = cents(i); i += 1 }
    out
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    PqRecErr.err(v.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]],
      flat, m, dsub, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"""${ev.value} = graft.functions.PqRecErr$$.MODULE$$
         |  .err($v, $c, $flatRef, $m, $dsub, $ksub);""".stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object PqRecErr {
  def err(a: ArrayData, codes: Array[Byte], flat: Array[Double],
      m: Int, dsub: Int, ksub: Int): Double = {
    val n = a.numElements()
    var acc = 0.0
    var sub = 0
    val mEff = if (codes.length < m) codes.length else m
    while (sub < mEff) {
      val cOff = (sub * ksub + (codes(sub) & 0xff)) * dsub
      val vOff = sub * dsub
      var j = 0
      while (j < dsub) {
        val x = if (vOff + j < n) a.getFloat(vOff + j).toDouble else 0.0
        val d = x - flat(cOff + j)
        acc += d * d
        j += 1
      }
      sub += 1
    }
    math.sqrt(acc)
  }
}
