package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a Long column against a FIXED pre-built bloom
  * filter (`org.apache.spark.util.sketch.BloomFilter` — Spark's public
  * sketch, buildable distributed via `df.stat.bloomFilter`). The filter
  * rides the expression as a reference object — map-only, no join, stays
  * inside whole-stage codegen (the [[LinearClassSums]] pattern). No
  * false negatives ever; false positives at the filter's fpp, so a
  * downstream exact re-check keeps composed operators exact while this
  * probe discards the overwhelming non-member bulk map-side. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain_long"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainLong($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
