package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SQL surface for the engine's custom expressions.
  *
  * Two ways in:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time, or
  *  - `GraftFunctions.register(spark)` on an existing session.
  *
  * After either, the distance/normalize kernels are plain SQL functions:
  * `SELECT l2sqr_distance(embedding, query) FROM t ORDER BY 1 LIMIT k`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

object GraftFunctions {

  private def binary(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(s"expected 2 arguments, got ${args.size}")
  }
  private def unary(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case args => throw new IllegalArgumentException(s"expected 1 argument, got ${args.size}")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2sqr_distance" -> binary(L2SqrDistance),
    "dot_product" -> binary(DotProduct),
    "cosine_distance" -> binary(CosineDistance),
    "l2_normalize" -> unary(L2Normalize),
    "sparse_dot" -> binary(SparseDot),
    "sparse_cosine_distance" -> binary(SparseCosineDistance),
    "sparse_l2sqr_distance" -> binary(SparseL2Sqr),
    "sparse_l2_normalize" -> unary(SparseL2Normalize),
    "quantize_vec" -> unary(QuantizeVec),
    // aggregate: topk_min(dist, id, k) -> array<struct<d,id>> (d asc, id asc)
    "topk_min" -> {
      case Seq(d, i, k) => TopKMin(d, i, k).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"expected 3 arguments, got ${args.size}")
    })

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
