package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long column against a BROADCAST Bloom filter —
  * the scan-stage prefilter of [[graft.dedup.Dedup.decontaminateBloom]].
  *
  * The filter rides in a `Broadcast` handle (fetched once per executor,
  * not serialized per task into the plan — a corpus-sized filter is tens
  * of MB, which `ctx.addReferenceObj` on the raw filter would copy into
  * every task's plan bytes), and the probe itself stays inside
  * whole-stage codegen: the generated code is one static-shaped virtual
  * call `bloom.value().mightContainLong(h)` per row — `value()` after
  * the first fetch is one volatile read. A Scala UDF would do the same
  * work but box the long and block expression-level null elision. */
case class BloomMightContainLong(child: Expression,
    bloom: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), bloom))
}

/** `Σ weights[bucket]` over a long-array bucket column against a
  * BROADCAST weight vector — the scan-stage linear-model scorer of
  * [[graft.pipeline.QualityClassifier]]. Same broadcast-in-expression
  * shape as [[BloomMightContainLong]]; out-of-range buckets are
  * impossible by construction (features are hashed mod the vector
  * length) but clamp to 0 contribution defensively. */
case class BucketDotExpr(child: Expression,
    weights: Broadcast[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(input: Any): Any =
    BucketDot.dot(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      weights.value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weightsBc", weights,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BucketDot.dot($c, (double[]) $ref.value())")
  }
  override protected def withNewChildInternal(newChild: Expression): BucketDotExpr =
    copy(child = newChild)
}

object BucketDot {
  /** Kernel shared by interpreted eval and generated code. */
  def dot(buckets: org.apache.spark.sql.catalyst.util.ArrayData,
      w: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = buckets.numElements()
    while (i < n) {
      val b = buckets.getLong(i)
      if (b >= 0 && b < w.length) s += w(b.toInt)
      i += 1
    }
    s
  }
}

object BucketDotExpr {
  def apply(c: Column, weights: Broadcast[Array[Double]]): Column =
    Bridge.column(BucketDotExpr(Bridge.expression(c), weights))
}
