package graft.ops

import graft.agg.AggRegistry.nanToNull
import graft.core.TimeseriesFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Difference operator family
  * (`orangecontrib/timeseries/widgets/owdifference.py:153-201`): per
  * selected column, append a derived series computed positionally over the
  * time order. All four ops are pure `lag` window expressions — one
  * `WindowExec`, no shuffle beyond the series-key exchange.
  *
  * Naming follows the reference (`owdifference.py:156-158,192-194`):
  * `delta_<c>`, `delta2_<c>`, `quot_<c>`, `pct_<c>`, with a `_<s>` postfix
  * when shift ≠ 1. `invertDirection` looks forward (`lead`) instead of
  * backward, matching the reference's series reversal
  * (`owdifference.py:163-165,188-189`).
  */
object Difference {

  sealed trait Op { def key: String }
  case object Delta extends Op { val key = "delta" }       // x[i] - x[i-s]
  case object Delta2 extends Op { val key = "delta2" }     // second difference, s=1
  case object Quotient extends Op { val key = "quot" }     // x[i] / x[i-s]
  case object PercentChange extends Op { val key = "pct" } // (quot - 1) * 100

  /** The reference appends the `:shift` postfix to EVERY op's output name
    * when shift ≠ 1, including Diff2 (`owdifference.py:158,193`) — even
    * though Diff2 itself always differences at lag 1. */
  def columnName(op: Op, c: String, shift: Int): String = {
    val base = s"${op.key}_$c"
    if (shift != 1) s"${base}_$shift" else base
  }

  /** The derived column for one op over one source column. */
  def expr(
      tsf: TimeseriesFrame,
      op: Op,
      c: String,
      shift: Int = 1,
      invertDirection: Boolean = false,
      assumeZeroBefore: Boolean = false): Column = {
    val w = tsf.window
    val x = nanToNull(col(c))
    // assume-zero only applies in the forward direction — the reference
    // ignores it when the series is reversed (test_owdifference.py:103-112)
    val zeroPad = assumeZeroBefore && !invertDirection
    def shifted(s: Int): Column = {
      val moved = if (invertDirection) lead(x, s).over(w) else lag(x, s).over(w)
      if (zeroPad) coalesce(moved, lit(0.0)) else moved
    }
    op match {
      case Delta  => x - shifted(shift)
      case Delta2 =>
        // np.diff(x, 2); assume-zero edge: out[1]=x[1]-2x[0]; out[0]=x[0]
        // (`owdifference.py:173-177`)
        x - lit(2.0) * shifted(1) + shifted(2)
      case Quotient => x / nullif(shifted(shift), lit(0.0))
      case PercentChange => (x / nullif(shifted(shift), lit(0.0)) - 1.0) * 100.0
    }
  }

  /** Append derived columns for each (op, column) to the original frame —
    * the widget's column-bind output (`owdifference.py:144-150,198`). */
  def apply(
      tsf: TimeseriesFrame,
      ops: Seq[(Op, String)],
      shift: Int = 1,
      invertDirection: Boolean = false,
      assumeZeroBefore: Boolean = false): DataFrame = {
    val derived = ops.map { case (op, c) =>
      expr(tsf, op, c, shift, invertDirection, assumeZeroBefore)
        .as(columnName(op, c, shift))
    }
    tsf.df.select(tsf.df.columns.map(col).toSeq ++ derived: _*)
  }
}
