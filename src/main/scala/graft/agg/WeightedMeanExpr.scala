package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * bit-identical to the HOF form. The kernel returns a boxed Double
  * (null = all-null window), letting `doGenCode` keep the projection
  * inside its whole-stage codegen span while preserving the null
  * contract. */
case class WeightedMeanSlotsExpr(child: Expression, weights: Seq[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  @transient private lazy val wArr = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    AggKernels.weightedMeanSlotsRow(input.asInstanceOf[ArrayData], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("wmWeights", wArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("wm")
      s"""
         |java.lang.Double $tmp = graft.agg.AggKernels.weightedMeanSlotsRow($c, $wRef);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WeightedMeanSlotsExpr =
    copy(child = newChild)
}

object WeightedMeanSlotsExpr {
  def apply(slots: Column, weights: Seq[Double]): Column =
    Bridge.column(WeightedMeanSlotsExpr(Bridge.expression(slots), weights))
}

/** Static row kernels shared by interpreted eval and Janino-generated
  * code (top-level object ⇒ static forwarders). */
object AggKernels {
  /** [[WeightedMeanSlotsExpr]] kernel; null means "all slots null". */
  def weightedMeanSlotsRow(arr: ArrayData, wArr: Array[Double]): java.lang.Double = {
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
    if (den == 0.0) null else java.lang.Double.valueOf(num / den)
  }
}
