package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, If, IsNaN, IsNull, Literal, Multiply, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** NaN-skipping product aggregate (`np.nanprod` semantics: null/NaN inputs
  * are skipped, an all-null group yields 1.0 — reference registry entry
  * `aggregate.py:154`, golden `test_aggregate.py:264`).
  *
  * A native Catalyst `DeclarativeAggregate`: the whole update/merge/
  * evaluate surface is pure expressions, so it participates in whole-stage
  * codegen and runs as an O(1)-per-row fold — over `groupBy`, sliding
  * window frames, and unbounded running frames alike. This replaces both a
  * bounded `collect_list` fold (exact but O(w) per row) and the
  * `exp(Σln|x|)·sign` trick (O(1) but ~1-ulp lossy and awkward around
  * zeros): exact AND cheap, at any frame length.
  */
case class NanProduct(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private lazy val product =
    AttributeReference("product", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil

  override lazy val initialValues: Seq[Expression] = Literal(1.0) :: Nil

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(child), IsNaN(child))
    If(skip, product, Multiply(product, child)) :: Nil
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Multiply(product.left, product.right) :: Nil

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NanProduct =
    copy(child = newChildren.head)
}

object NanProduct {
  /** Column-level entry point: usable in `agg` and over window frames. */
  def nanProduct(c: Column): Column =
    Bridge.column(AggregateExpression(
      NanProduct(Cast(Bridge.expression(c), DoubleType)),
      Complete, isDistinct = false))
}
