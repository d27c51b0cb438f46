package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sparse vectors are plain structs: struct<indices: array<int>, values: array<float>>
  * with strictly increasing indices (reference: engine/db/vector.hpp:13-19).
  * Distances are merge-joins over the index-sorted pairs
  * (reference: engine/db/vector.cpp:7-100). The binary distances emit the
  * merge loop via doGenCode (whole-stage codegen); only the ingest-side
  * normalize stays interpreted.
  */
object SparseVec {
  val sqlType: StructType = StructType(Seq(
    StructField("indices", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** (dot, normA2, normB2) in one merge pass. */
  def merge(ai: ArrayData, av: ArrayData, bi: ArrayData, bv: ArrayData): (Double, Double, Double) = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0; var j = 0
    val n = ai.numElements(); val m = bi.numElements()
    while (i < n && j < m) {
      val x = ai.getInt(i); val y = bi.getInt(j)
      if (x == y) {
        val a = av.getFloat(i).toDouble; val b = bv.getFloat(j).toDouble
        dot += a * b; i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    i = 0
    while (i < n) { val a = av.getFloat(i).toDouble; na += a * a; i += 1 }
    j = 0
    while (j < m) { val b = bv.getFloat(j).toDouble; nb += b * b; j += 1 }
    (dot, na, nb)
  }
}

abstract class SparseBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def compute(dot: Double, na: Double, nb: Double): Double
  /** Java expression over accumulators `dot`, `na`, `nb` (same formula as
    * `compute`) — emitted into whole-stage codegen. */
  protected def finishJava(dot: String, na: String, nb: String): String
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[InternalRow]; val b = r.asInstanceOf[InternalRow]
    val (dot, na, nb) = SparseVec.merge(a.getArray(0), a.getArray(1), b.getArray(0), b.getArray(1))
    compute(dot, na, nb)
  }

  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val ai = ctx.freshName("ai"); val av = ctx.freshName("av")
    val bi = ctx.freshName("bi"); val bv = ctx.freshName("bv")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $ai = $a.getArray(0);
         |org.apache.spark.sql.catalyst.util.ArrayData $av = $a.getArray(1);
         |org.apache.spark.sql.catalyst.util.ArrayData $bi = $b.getArray(0);
         |org.apache.spark.sql.catalyst.util.ArrayData $bv = $b.getArray(1);
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |final int $n = $ai.numElements(), $m = $bi.numElements();
         |int $i = 0, $j = 0;
         |while ($i < $n && $j < $m) {
         |  final int x = $ai.getInt($i), y = $bi.getInt($j);
         |  if (x == y) { $dot += (double)$av.getFloat($i) * (double)$bv.getFloat($j); $i++; $j++; }
         |  else if (x < y) $i++; else $j++;
         |}
         |for ($i = 0; $i < $n; $i++) { final double v = (double)$av.getFloat($i); $na += v * v; }
         |for ($j = 0; $j < $m; $j++) { final double v = (double)$bv.getFloat($j); $nb += v * v; }
         |${ev.value} = ${finishJava(dot, na, nb)};
       """.stripMargin
    })
  }
}

/** dot(a,b) over sparse structs (reference: vector.cpp GetDotDist negated at call). */
case class SparseDot(left: Expression, right: Expression) extends SparseBinary {
  override def prettyName: String = "sparse_dot"
  protected def compute(dot: Double, na: Double, nb: Double): Double = dot
  protected def finishJava(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** cosine distance 1 - dot/(|a||b|) (reference: vector.cpp:40-56). */
case class SparseCosineDistance(left: Expression, right: Expression) extends SparseBinary {
  override def prettyName: String = "sparse_cosine_distance"
  protected def compute(dot: Double, na: Double, nb: Double): Double =
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  protected def finishJava(dot: String, na: String, nb: String): String =
    s"($na == 0.0 || $nb == 0.0) ? 1.0 : 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** squared L2 = |a|^2 + |b|^2 - 2 dot (reference: vector.cpp:58-100 merge form). */
case class SparseL2Sqr(left: Expression, right: Expression) extends SparseBinary {
  override def prettyName: String = "sparse_l2sqr"
  protected def compute(dot: Double, na: Double, nb: Double): Double = {
    val d = na + nb - 2.0 * dot
    if (d < 0.0) 0.0 else d
  }
  protected def finishJava(dot: String, na: String, nb: String): String =
    s"java.lang.Math.max(0.0, $na + $nb - 2.0 * $dot)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2-normalize a sparse struct (reference: table_segment_mvp.cpp:555-562).
  * Codegen'd like the distances — the ingest stage stays one span. */
case class SparseL2Normalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sparse_l2_normalize"
  override def dataType: DataType = SparseVec.sqlType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val idx = row.getArray(0); val vals = row.getArray(1)
    val n = vals.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val x = vals.getFloat(i).toDouble; acc += x * x; i += 1 }
    if (acc == 0.0) row.copy()
    else {
      val inv = 1.0 / math.sqrt(acc)
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (vals.getFloat(i) * inv).toFloat; i += 1 }
      InternalRow(idx.copy(), new GenericArrayData(out))
    }
  }
  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val vals = ctx.freshName("vals"); val n = ctx.freshName("n")
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    val out = ctx.freshName("out"); val inv = ctx.freshName("inv")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $vals = $c.getArray(1);
         |final int $n = $vals.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double x = (double) $vals.getFloat($i); $acc += x * x;
         |}
         |if ($acc == 0.0) {
         |  ${ev.value} = $c.copy();
         |} else {
         |  final double $inv = 1.0 / java.lang.Math.sqrt($acc);
         |  final float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (float) ($vals.getFloat($i) * $inv);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(new Object[] {
         |    $c.getArray(0).copy(),
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out) });
         |}
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
