package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native slot-weighted mean for the reference's weighted moving averages
  * (`orangecontrib/timeseries/aggregate.py:50-70`): slot `j` of the
  * collected window (oldest first, null slots preserved) is weighted by
  * `weights(j)`; the weight mass is renormalized over the defined slots,
  * and an all-null window yields null.
  *
  * Replaces the previous `zip_with`/`aggregate` higher-order-function
  * formulation, whose lambdas are CodegenFallback and interpreted per
  * element — at width w that was ~4·w interpreted expression evaluations
  * per output row. This node is one tight JVM loop over the slots with a
  * precomputed weight table; semantics (including partial leading windows,
  * where only slots `0..m-1` exist and receive `weights(0..m-1)`) are
  * bit-identical to the HOF form.
  */
case class WeightedMeanSlotsExpr(child: Expression, weights: Seq[Double])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  @transient private lazy val wArr = weights.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), wArr.length)
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < n) {
      val slot = arr.getStruct(j, 1)
      if (!slot.isNullAt(0)) {
        val w = wArr(j)
        num += slot.getDouble(0) * w
        den += w
      }
      j += 1
    }
    if (den == 0.0) null else num / den
  }

  override protected def withNewChildInternal(newChild: Expression): WeightedMeanSlotsExpr =
    copy(child = newChild)
}

object WeightedMeanSlotsExpr {
  def apply(slots: Column, weights: Seq[Double]): Column =
    Bridge.column(WeightedMeanSlotsExpr(Bridge.expression(slots), weights))
}
