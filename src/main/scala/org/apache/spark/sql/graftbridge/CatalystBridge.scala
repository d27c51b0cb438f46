package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. Spark 4 made `ExpressionUtils` and the
  * `Column(Expression)` constructor private[sql]; extensions conventionally
  * reach them from a source file inside the org.apache.spark.sql package.
  */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage of a `localCheckpoint()`-backed Dataset: such a
    * frame's plan is a LogicalRDD over the checkpointed RDD, and the
    * blocks are OWNED by that RDD — `Dataset.unpersist` only touches
    * CacheManager entries, so it is a no-op on them; without this the
    * blocks wait for a driver GC + ContextCleaner sweep. Returns true
    * when a checkpoint RDD was found and unpersisted. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame,
      blocking: Boolean = false): Boolean =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking); true
      case _ => false
    }

  /** If the Column is a sort-order wrapper (`.asc`/`.desc`/nulls
    * variants), return (child column, ascending?, nullsFirst?). Spark 4
    * sort Columns are `internal.SortOrder` ColumnNodes (NOT catalyst
    * SortOrder — `expression()` returns them still wrapped, and a
    * SortOrder is unevaluable if it leaks into a value position). */
  def unwrapSortOrder(c: Column): Option[(Column, Boolean, Boolean)] = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      Some((Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Ascending,
        so.nullOrdering == org.apache.spark.sql.internal.SortOrder.NullsFirst))
    case _ => None
  }

  /** Whether the Column references attribute `name` anywhere. Spark 4
    * Columns are ColumnNode trees (catalyst conversion is deferred, so a
    * plain Expression walk sees one opaque ColumnNodeExpression leaf);
    * nodes and catalyst expressions can wrap each other
    * (ExpressionColumnNode / ColumnNodeExpression), so both are walked. */
  def referencesAttribute(c: Column, name: String): Boolean = {
    var found = false
    def scanNode(n: org.apache.spark.sql.internal.ColumnNodeLike): Unit =
      n.foreach {
        case a: org.apache.spark.sql.internal.UnresolvedAttribute
            if a.nameParts == Seq(name) => found = true
        case e: org.apache.spark.sql.classic.ExpressionColumnNode =>
          scanExpr(e.expression)
        case _ => ()
      }
    def scanExpr(e: Expression): Unit = e.foreach {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.name == name => found = true
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if a.name == name => found = true
      // ColumnNodeExpression is private[classic]; the wrapped node is
      // reached reflectively (cold path — only mixed node/expr trees)
      case n if n.getClass.getName ==
          "org.apache.spark.sql.classic.ColumnNodeExpression" =>
        scanNode(n.getClass.getMethod("node").invoke(n)
          .asInstanceOf[org.apache.spark.sql.internal.ColumnNode])
      case _ => ()
    }
    scanNode(c.node)
    found
  }
}

/** Spark 4 also made `AbstractDataType` private[sql], so an expression
  * outside this package cannot WRITE the `inputTypes` signature that
  * `ImplicitCastInputTypes` requires. This trait pins the signature here
  * and lets graft expressions declare plain `DataType`s. */
trait GraftImplicitCasts
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  def graftInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    graftInputTypes
}
