package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-class micro-unit weight sums of a token array under a FIXED linear
  * model — the apply step of a trained fastText-style classifier (quality
  * filter, language ID: the model is an input, e.g. a weights file).
  * Returns `array<bigint>` of length k: element c = Σ over tokens of the
  * token's class-c weight in MICRO units (unknown tokens weigh 0). Long
  * accumulation is order-free and exact, so the sums are bit-identical on
  * any engine and any partitioning.
  *
  * The weight table rides the expression as a hash-indexed reference
  * object — O(1) per token, NOT the O(|vocab|)-per-token linear scan a
  * Catalyst literal-map `element_at` (GetMapValue over ArrayBasedMapData)
  * performs; at a trained 10⁵-entry vocab × 512 tokens/doc that scan is
  * ~10⁸ string compares per row. Map-only, no join/shuffle, stays inside
  * whole-stage codegen via a static kernel (the [[BpeGreedyTokens]]
  * pattern). */
case class LinearClassSums(child: Expression, numClasses: Int,
    weights: Seq[(String, Seq[Long])]) extends UnaryExpression {
  require(numClasses >= 1, "numClasses must be >= 1")
  require(weights.forall(_._2.length == numClasses),
    "every weight row must carry one value per class")
  override def prettyName: String = "linear_class_sums"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val table: LinearClassSums.Weights =
    new LinearClassSums.Weights(numClasses, weights)

  override def nullSafeEval(a: Any): Any =
    LinearClassSums.sums(a.asInstanceOf[ArrayData], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("linWeights", table,
      classOf[LinearClassSums.Weights].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.LinearClassSums$$.MODULE$$
         |  .sums($c, $ref);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LinearClassSums {
  /** Hash-indexed weight table: token -> one micro-unit Long per class. */
  final class Weights(val k: Int, entries: Seq[(String, Seq[Long])])
      extends Serializable {
    val map = new java.util.HashMap[UTF8String, Array[Long]](
      math.max(16, entries.length * 2))
    entries.foreach { case (t, ws) =>
      map.put(UTF8String.fromString(t), ws.toArray)
    }
  }

  def sums(toks: ArrayData, w: Weights): ArrayData = {
    val acc = new Array[Long](w.k)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val ws = w.map.get(toks.getUTF8String(i))
        if (ws != null) {
          var c = 0
          while (c < w.k) { acc(c) += ws(c); c += 1 }
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }
}
