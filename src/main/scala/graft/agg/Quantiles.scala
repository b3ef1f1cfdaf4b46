package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped quantile tables — the threshold surface quality-filtering
  * pipelines cut on (keep docs above the per-language p25 score, trim
  * value outliers beyond the per-user p99, …).
  *
  * [[exact]] uses Spark's `percentile` (type-7 linear interpolation on
  * the sorted group, the same estimator as NumPy's default and DuckDB's
  * `quantile_cont`, so integer inputs reproduce bit-for-bit across
  * engines — the q67 oracle). Exact percentile buffers each group's
  * values, so it is the correctness surface: right whenever a single
  * group fits an executor (thousands of groups × bounded group size —
  * the grouped-series shape everywhere else in this library).
  *
  * [[approx]] is the unbounded-group scale path: `approx_percentile`
  * (Greenwald–Khanna sketch) holds O(1/accuracy) state per group
  * regardless of group size and merges map-side, the formulation for
  * per-domain thresholds over 10¹¹ documents. Rank error ≤ 1/accuracy —
  * pinned to [[exact]] in the spec, not hash-gated (sketch internals are
  * engine-specific). */
object Quantiles {

  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(pExprs(valueCol, ps, exactAgg = true).head,
        pExprs(valueCol, ps, exactAgg = true).tail: _*)

  def approx(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(pExprs(valueCol, ps, exactAgg = false, accuracy).head,
        pExprs(valueCol, ps, exactAgg = false, accuracy).tail: _*)

  private def pExprs(valueCol: String, ps: Seq[Double], exactAgg: Boolean,
      accuracy: Int = 10000) = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad ps: $ps")
    ps.map { p =>
      // round, never truncate: (0.29 * 100).toInt is 28 in binary floats.
      // One rounded per-mille integer derives both label parts.
      val pm = math.round(p * 1000)
      val name = s"p${pm / 10}" + (if (pm % 10 != 0) (pm % 10).toString else "")
      val c =
        if (exactAgg) percentile(col(valueCol), lit(p))
        else approx_percentile(col(valueCol), lit(p), lit(accuracy)).cast("double")
      c.as(name)
    }
  }
}
