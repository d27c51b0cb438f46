package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense-vector distance kernels as native Catalyst expressions with
  * whole-stage-codegen support.
  *
  * Semantics follow the reference engine's distance functions
  * (reference: engine/db/index/index.cpp:10-35, engine/db/index/space_l2.hpp,
  * space_cosine.hpp:8-16, space_ip.hpp:8-20):
  *   - l2 distance   = sum((a_i-b_i)^2)            (squared, no sqrt)
  *   - cosine dist   = 1 - dot(a,b)                (vectors pre-normalized at ingest)
  *   - dot dist      = -dot(a,b)
  * The reference's SIMD kernels (engine/db/index/distance_simd.cpp) are replaced
  * by JIT-compiled scalar loops emitted via doGenCode — the JVM auto-vectorizes
  * these on modern hardware.
  *
  * Accumulation is in double (the reference accumulates in float32; all golden
  * fixtures are well-separated so orderings agree, and double matches the
  * DuckDB correctness oracle bit-for-bit on the cast-to-double inputs).
  */
abstract class DenseDistance extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for the per-element loop body; acc/da/db in scope. */
  protected def loopBody(a: String, b: String, i: String, acc: String): String
  protected def finish(acc: String, n: String): String

  protected def evalLoop(a: ArrayData, b: ArrayData): Double
  override def nullSafeEval(l: Any, r: Any): Any =
    evalLoop(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${loopBody(a, b, i, acc)}
         |}
         |${ev.value} = ${finish(acc, n)};
       """.stripMargin
    })
  }
}

/** Squared Euclidean distance over array<float>. */
case class L2SqrDistance(left: Expression, right: Expression) extends DenseDistance {
  override def prettyName: String = "l2sqr_distance"
  protected def loopBody(a: String, b: String, i: String, acc: String): String =
    s"final double d = (double)$a.getFloat($i) - (double)$b.getFloat($i); $acc += d * d;"
  protected def finish(acc: String, n: String): String = acc
  protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; acc += d * d; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot(a,b) over array<float>. */
case class DotProduct(left: Expression, right: Expression) extends DenseDistance {
  override def prettyName: String = "dot_product"
  protected def loopBody(a: String, b: String, i: String, acc: String): String =
    s"$acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);"
  protected def finish(acc: String, n: String): String = acc
  protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine *distance* 1 - dot(a,b)/(|a||b|). The reference stores normalized
  * vectors and computes 1-dot (space_cosine.hpp:8-16); this expression computes
  * the full form so it is correct for raw (un-normalized) inputs too. On
  * pre-normalized inputs the norms are ~1 and it degrades to 1-dot. */
case class CosineDistance(left: Expression, right: Expression) extends DenseDistance {
  override def prettyName: String = "cosine_distance"
  protected def loopBody(a: String, b: String, i: String, acc: String): String = "" // unused
  protected def finish(acc: String, n: String): String = acc
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |final int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double x = (double)$a.getFloat($i);
         |  final double y = (double)$b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 1.0
         |  : 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }
  protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2-normalize an array<float> (the reference normalizes COSINE fields at
  * ingest so query-time cosine becomes a dot product —
  * table_segment_mvp.cpp:580-587). Zero vectors pass through unchanged.
  * Codegen'd: ingest normalize runs inside the same whole-stage span as
  * the cast/validation projections around it. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    if (acc == 0.0) a.copy()
    else {
      val inv = 1.0 / math.sqrt(acc)
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (a.getFloat(i) * inv).toFloat; i += 1 }
      new GenericArrayData(out)
    }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
    val i = ctx.freshName("i"); val out = ctx.freshName("out")
    val inv = ctx.freshName("inv")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |final int $n = $c.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double x = (double) $c.getFloat($i); $acc += x * x;
         |}
         |if ($acc == 0.0) {
         |  ${ev.value} = $c.copy();
         |} else {
         |  final double $inv = 1.0 / java.lang.Math.sqrt($acc);
         |  final float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (float) ($c.getFloat($i) * $inv);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
