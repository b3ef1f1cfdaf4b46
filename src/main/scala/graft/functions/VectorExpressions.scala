package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native dot product over two `array<double>` columns — a strict
  * sequential left-fold, so the result is bit-identical to both the
  * higher-order-function formulation (`aggregate(zip_with(...))`) and
  * DuckDB's `list_inner_product`. The HOF version interprets its lambda
  * per element and allocates an intermediate array per row (~90µs per
  * 64-dim pair); this is one tight loop (~0.1µs), codegen'd as a static
  * kernel call so the embedding-scan projections keep their whole-stage
  * codegen span (CodegenFallback would evict the whole operator). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.dotRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorFunctions.dotRow($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** [[DotProductExpr]] kernel (shared by eval and generated code). */
  def dotRow(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2SqExpr(Bridge.expression(a), Bridge.expression(b)))

  /** [[L2SqExpr]] kernel: strict sequential fold of squared element
    * differences — the identical op order to the HOF
    * `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, acc+x)`, so
    * results are bit-for-bit equal (equal-length arrays; like
    * [[dotRow]], folds over the shorter length if they differ, where the
    * HOF form would yield null). */
  def l2sqRow(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def arrayDiv(v: Column, s: Column): Column =
    Bridge.column(ArrayDivExpr(Bridge.expression(v), Bridge.expression(s)))

  /** [[ArrayDivExpr]] kernel: each element divided by the scalar — the
    * per-element op of `transform(v, _ / s)`, one loop per row. */
  def arrayDivRow(v: ArrayData, s: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = v.getDouble(i) / s; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The LCG hyperplane component shared by [[LshBucketExpr]], the Column
    * API, and the SQL oracle:
    * `((1103515245·((t·7368787 + p·1000003 + i) mod 2³¹−1) + 12345)
    *   mod 2³¹) / 2³⁰ − 1`. */
  def lcgPlaneComponent(table: Int, plane: Int, i: Int): Double = {
    val s = (table.toLong * 7368787L + plane.toLong * 1000003L + i) % 2147483647L
    ((1103515245L * s + 12345L) % 2147483648L).toDouble / 1073741824.0 - 1.0
  }

  /** [[LshBucketExpr]] kernel: all hyperplane sign bits in one loop. */
  def lshBucketRow(v: ArrayData, planes: Array[Array[Double]], dim: Int): Long = {
    val n = math.min(v.numElements(), dim)
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * w(i); i += 1 }
      if (acc >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  def lshBucket(vec: Column, numPlanes: Int, table: Int, dim: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(vec), numPlanes, table, dim))
}

/** Squared Euclidean distance between two `array<double>` columns —
  * strict sequential fold, bit-identical to the HOF formulation (see
  * [[VectorFunctions.l2sqRow]]). */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.l2sqRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorFunctions.l2sqRow($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

/** Element-wise divide of an `array<double>` by a double scalar (vector
  * normalization) — one loop per row instead of an interpreted
  * `transform` lambda per element. */
case class ArrayDivExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any, s: Any): Any =
    VectorFunctions.arrayDivRow(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) =>
      s"graft.functions.VectorFunctions.arrayDivRow($v, $s)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDivExpr =
    copy(left = newLeft, right = newRight)
}

/** All `numPlanes` hyperplane sign bits in one expression node. The
  * first-cut formulation built 2·numPlanes·dim literal nodes per side
  * (plane arrays as literals feeding per-plane dot products), which cost
  * ~8s of optimizer + Janino time per query — the hyperplanes are instead
  * materialized once on the executor (a codegen reference object) and the
  * projection is a tight loop. */
case class LshBucketExpr(child: Expression, numPlanes: Int, table: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(numPlanes, dim)((p, i) => VectorFunctions.lcgPlaneComponent(table, p, i))
  override protected def nullSafeEval(input: Any): Any =
    VectorFunctions.lshBucketRow(input.asInstanceOf[ArrayData], planes, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorFunctions.lshBucketRow($c, $pRef, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}
