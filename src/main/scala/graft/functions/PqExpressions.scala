package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011) — the
  * memory-scale path for embedding search: a d-dim vector becomes `m`
  * small codes (one per d/m-dim subspace), and query–candidate scores are
  * looked up from a per-query table instead of touching the raw floats.
  * At 100 TB of corpus embeddings this is the difference between shuffling
  * 3 KB and ~16 B per candidate.
  *
  * All three kernels are strict sequential folds (the codebase's
  * determinism rule — see [[VectorFunctions.dotRow]]): ties in the encode
  * argmin resolve to the LOWEST centroid id, matching a SQL
  * `row_number() OVER (ORDER BY dist, cid)` oracle.
  */
object PqFunctions {

  /** [[PqEncodeExpr]] kernel: per subspace `s`, the index of the nearest
    * (squared-L2) of `ksub` centroids; strict `<` keeps the lowest index
    * on exact ties. `cb` is laid out `[(s·ksub + j)·dsub + d]`. */
  def pqEncodeRow(v: ArrayData, m: Int, dsub: Int, ksub: Int,
      cb: Array[Double]): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(s * dsub + d) - cb(base + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** [[PqLutExpr]] kernel: the per-query ADC lookup table — partial inner
    * products of each query subvector against every centroid of its
    * subspace, flattened `lut[s·ksub + j]`. */
  def pqLutRow(q: ArrayData, m: Int, dsub: Int, ksub: Int,
      cb: Array[Double]): ArrayData = {
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        val base = (s * ksub + j) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) { acc += q.getDouble(s * dsub + d) * cb(base + d); d += 1 }
        out(s * ksub + j) = acc
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** [[PqAdcExpr]] kernel: asymmetric-distance score = Σ_s
    * lut[s·ksub + code[s]] — the approximate inner product of the raw
    * query against the quantized candidate. */
  def pqAdcRow(lut: ArrayData, code: ArrayData, ksub: Int): Double = {
    val m = code.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut.getDouble(s * ksub + code.getInt(s)); s += 1 }
    acc
  }

  /** [[HierArgminExpr]] kernel: two-level nearest-centroid assignment —
    * squared-L2 argmin over `k1` coarse centroids, then argmin over THAT
    * cell's `k2` fine centroids; global id = coarse·k2 + fine. Strict `<`
    * ties → lowest id at both levels. `coarse` laid out `[j·d + i]`,
    * `fine` `[(cell·k2 + j)·d + i]`. O((k1 + k2)·d) per row instead of
    * the flat argmin's O(k1·k2·d) — the FAISS coarse-quantizer shape. */
  def hierArgminRow(v: ArrayData, dim: Int, k1: Int, k2: Int,
      coarse: Array[Double], fine: Array[Double]): Int = {
    var bestC = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < k1) {
      val base = j * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val df = v.getDouble(i) - coarse(base + i)
        acc += df * df
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = j }
      j += 1
    }
    var bestF = 0
    bestD = Double.MaxValue
    j = 0
    while (j < k2) {
      val base = (bestC * k2 + j) * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val df = v.getDouble(i) - fine(base + i)
        acc += df * df
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestF = j }
      j += 1
    }
    bestC * k2 + bestF
  }

  def pqEncode(vec: Column, m: Int, dsub: Int, ksub: Int, cb: Array[Double]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(vec), m, dsub, ksub, cb))

  def pqLut(qvec: Column, m: Int, dsub: Int, ksub: Int, cb: Array[Double]): Column =
    Bridge.column(PqLutExpr(Bridge.expression(qvec), m, dsub, ksub, cb))

  def hierArgmin(vec: Column, dim: Int, k1: Int, k2: Int,
      coarse: Array[Double], fine: Array[Double]): Column =
    Bridge.column(HierArgminExpr(Bridge.expression(vec), dim, k1, k2, coarse, fine))

  def pqAdc(lut: Column, code: Column, ksub: Int): Column =
    Bridge.column(PqAdcExpr(Bridge.expression(lut), Bridge.expression(code), ksub))
}

/** `array<double>` vector → `array<int>` of `m` PQ codes. The codebook
  * rides as a codegen reference object (same pattern as
  * [[LshBucketExpr]]'s hyperplanes) so the projection stays one static
  * kernel call inside whole-stage codegen. */
case class PqEncodeExpr(child: Expression, m: Int, dsub: Int, ksub: Int,
    cb: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PqFunctions.pqEncodeRow(input.asInstanceOf[ArrayData], m, dsub, ksub, cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqFunctions.pqEncodeRow($c, $m, $dsub, $ksub, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `array<double>` query vector → flattened `array<double>` ADC lookup
  * table of length m·ksub. */
case class PqLutExpr(child: Expression, m: Int, dsub: Int, ksub: Int,
    cb: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PqFunctions.pqLutRow(input.asInstanceOf[ArrayData], m, dsub, ksub, cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqFunctions.pqLutRow($c, $m, $dsub, $ksub, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** (lut `array<double>`, code `array<int>`) → approximate inner-product
  * score. The hot expression of a PQ scan: one array lookup + add per
  * subspace, no floats from the candidate side at all. */
/** `array<double>` vector → two-level cluster id (see
  * [[PqFunctions.hierArgminRow]]); both codebooks ride as codegen
  * reference objects. */
case class HierArgminExpr(child: Expression, dim: Int, k1: Int, k2: Int,
    coarse: Array[Double], fine: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    PqFunctions.hierArgminRow(input.asInstanceOf[ArrayData], dim, k1, k2, coarse, fine)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("hierCoarse", coarse, "double[]")
    val fRef = ctx.addReferenceObj("hierFine", fine, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqFunctions.hierArgminRow($c, $dim, $k1, $k2, $cRef, $fRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): HierArgminExpr =
    copy(child = newChild)
}

case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(lut: Any, code: Any): Any =
    PqFunctions.pqAdcRow(lut.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.functions.PqFunctions.pqAdcRow($l, $c, $ksub)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
