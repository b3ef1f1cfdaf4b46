package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import graft.functions.NanProduct.nanProduct

/** The 18-aggregation registry — Spark re-expression of the reference's
  * `AggOptions` (`orangecontrib/timeseries/aggregate.py:125-183`). Every
  * aggregation is NaN-skipping (NaN ≡ SQL null here; inputs are normalized
  * via [[nanToNull]]) with the reference's edge rules, pinned by the goldens
  * in `orangecontrib/timeseries/test_aggregate.py:259-305`:
  *
  *  - sum of an all-null window → 0 (np.nancumsum), product → 1 (np.nanprod)
  *  - std/var are population (ddof=0)
  *  - weighted MAs renormalize weights over non-null slots; all-null → null
  *    (`aggregate.py:50-70`)
  *  - harmonic/geometric: any null or negative in the window → null; any
  *    zero → 0 (scipy hmean ValueError fallback / gmean log-domain)
  *  - mode omits nulls, all-null → null, ties pick the smallest value
  *    (scipy.stats.mode)
  *
  * All builders return plain `Column` expressions (codegen-friendly window /
  * hash aggregates); the only non-expression pieces are bounded
  * `collect_list` buffers for order-sensitive aggs (weighted MAs, mode,
  * exact product) whose size is capped by the window width — the reference
  * GUI caps width at 1000 (`owmovingtransform.py:168`), so buffers are
  * small and executor-local regardless of table size.
  */
object AggRegistry {

  /** Aggregation keys in reference registry order. */
  val keys: Seq[String] = Seq(
    "mean", "sum", "product", "min", "max", "span", "median", "mode",
    "std", "var", "lin_ma", "exp_ma", "harmonic", "geometric",
    "nonzero", "defined", "cumsum", "cumprod")

  /** Aggs with a whole-block form (usable in groupBy); the sliding-only
    * ones (weighted MAs, cumulatives) are excluded exactly as the reference
    * flags them inapplicable for time-period aggregation
    * (`owmovingtransform.py:520-522,564-571`). */
  val blockKeys: Seq[String] = keys.filterNot(
    Set("lin_ma", "exp_ma", "cumsum", "cumprod"))

  /** Count-style aggs whose output is integral (`count_aggregate` flag,
    * `owmovingtransform.py:560-562`). */
  val countKeys: Set[String] = Set("nonzero", "defined")

  /** NaN ≡ missing: normalize float NaN to SQL null once at the boundary. */
  def nanToNull(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d), lit(null).cast("double")).otherwise(d)
  }

  // ---------------------------------------------------------------- helpers

  private def safeDiv(num: Column, den: Column): Column =
    when(den === 0.0, lit(null).cast("double")).otherwise(num / den)

  /** Weighted mean with per-row weight renormalization over non-null slots
    * (`aggregate.py:50-70`): collect the window as null-preserving struct
    * slots, then fold them in one native loop against the precomputed
    * weight table ([[WeightedMeanSlotsExpr]]). All-null → null; a partial
    * leading window of m slots receives `weights(0..m-1)`. */
  private def weightedMA(v: Column, w: WindowSpec, weights: Seq[Double]): Column =
    WeightedMeanSlotsExpr(collect_list(struct(v.as("v"))).over(w), weights)

  /** The previous higher-order-function formulation of [[weightedMA]] —
    * `zip_with`/`aggregate` lambdas, interpreted per slot. Kept as the
    * differential oracle for `WeightedMeanExprSpec`; not used on any query
    * path. */
  private[agg] def weightedMAHof(v: Column, w: WindowSpec, weights: Seq[Double]): Column = {
    val slots = collect_list(struct(v.as("v"))).over(w) // keeps null slots
    val wArr = array(weights.map(lit): _*)
    val num = aggregate(
      zip_with(slots, wArr,
        (s, wi) => when(s("v").isNotNull, s("v") * wi).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x)
    val den = aggregate(
      zip_with(slots, wArr,
        (s, wi) => when(s("v").isNotNull, wi).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x)
    safeDiv(num, den)
  }

  /** Slot weights for the two reference weighted MAs (`aggregate.py:50-70`):
    * oldest slot first. */
  private[agg] def maWeights(key: String, width: Int): Seq[Double] = key match {
    case "lin_ma" => (1 to width).map(_.toDouble)
    case "exp_ma" =>
      val alpha = 2.0 / (width + 1.0)
      (0 until width).map(i => alpha * math.pow(1.0 - alpha, (width - 1 - i).toDouble))
    case k => throw new IllegalArgumentException(s"no MA weights for agg: $k")
  }

  /** scipy.stats.mode semantics: most frequent non-null value, ties →
    * smallest value. O(k²) over the distinct values of a bounded buffer. */
  private def modeOf(arr: Column): Column = {
    val distinct = array_distinct(arr)
    val counted = transform(distinct, v =>
      struct(size(filter(arr, x => x === v)).as("n"), v.as("v")))
    // max by (count, -value): encode as (n, -v) lexicographic max
    val best = array_max(transform(counted, s =>
      struct(s("n").as("n"), (-s("v")).as("negv"))))
    when(size(arr) === 0, lit(null).cast("double")).otherwise(-best("negv"))
  }

  // ------------------------------------------------------------- windowed

  /** Sliding aggregation of `x` over the trailing `width`-row frame of
    * window `base` (un-framed, ordered). The caller gates leading
    * incomplete windows (rows `rn < width`) per keep-mode. */
  /** Hard cap on widths of buffer-backed aggs (collect_list buffers for
    * mode / weighted MAs): mirrors the reference GUI's width limit
    * (`owmovingtransform.py:168`). The cap is what keeps those buffers
    * executor-local at ANY table size, so it is asserted, not assumed. */
  val maxBufferedWidth = 1000
  private val bufferBacked = Set("mode", "lin_ma", "exp_ma")

  /** Assert the buffered-agg width cap (no-op for unbuffered keys). */
  def requireBufferedWidth(key: String, width: Int): Unit =
    require(!bufferBacked(key) || width <= maxBufferedWidth,
      s"agg '$key' buffers the window; width $width > cap $maxBufferedWidth")

  def windowed(key: String, x: Column, base: WindowSpec, width: Int): Column = {
    requireBufferedWidth(key, width)
    val v = nanToNull(x)
    val w = base.rowsBetween(-(width - 1L), 0L)
    val run = base.rowsBetween(Long.MinValue, 0L)
    def defined = count(v).over(w).cast("double")
    def negs = count(when(v < 0.0, 1)).over(w)
    def zeros = count(when(v === 0.0, 1)).over(w)
    key match {
      case "mean"    => avg(v).over(w)
      case "sum"     => coalesce(sum(v).over(w), lit(0.0))
      case "product" => nanProduct(v).over(w)
      case "min"     => min(v).over(w)
      case "max"     => max(v).over(w)
      case "span"    => max(v).over(w) - min(v).over(w)
      case "median"  => percentile(v, lit(0.5)).over(w)
      case "mode"    => modeOf(transform(
        filter(collect_list(struct(v.as("v"))).over(w), s => s("v").isNotNull),
        s => s("v")))
      case "std"     => stddev_pop(v).over(w)
      case "var"     => var_pop(v).over(w)
      case "lin_ma" | "exp_ma" => weightedMA(v, w, maWeights(key, width))
      case "harmonic" =>
        when(defined < lit(width.toDouble) || negs > 0, lit(null).cast("double"))
          .when(zeros > 0, 0.0)
          .otherwise(lit(width.toDouble) / sum(lit(1.0) / nullif(v, lit(0.0))).over(w))
      case "geometric" =>
        when(defined < lit(width.toDouble) || negs > 0, lit(null).cast("double"))
          .when(zeros > 0, 0.0)
          .otherwise(exp(avg(log(v)).over(w)))
      case "nonzero" => count(when(v =!= 0.0, 1)).over(w)
      case "defined" => count(v).over(w)
      case "cumsum"  => coalesce(sum(v).over(run), lit(0.0))
      case "cumprod" => nanProduct(v).over(run)
      case k => throw new IllegalArgumentException(s"unknown agg: $k")
    }
  }

  /** Positional weighted mean for the EXPLODED window form — the hash-
    * aggregate twin of [[weightedMA]] (`aggregate.py:50-70`): each exploded
    * membership row carries its 0-based slot position `pos` (0 = oldest),
    * so the weight is a literal-array lookup and the renormalization over
    * non-null slots is two plain `sum`s — map-side combinable, no
    * collect_list buffer, no window. All-null window → null. */
  def positional(key: String, x: Column, pos: Column, width: Int): Column = {
    requireBufferedWidth(key, width) // the weight literal array is `width` wide
    val v = nanToNull(x)
    val wArr = array(maWeights(key, width).map(lit): _*)
    val wi = element_at(wArr, pos.cast("int") + 1)
    val num = sum(when(v.isNotNull, wi * v).otherwise(0.0))
    val den = sum(when(v.isNotNull, wi).otherwise(0.0))
    safeDiv(num, den)
  }

  // ---------------------------------------------------------------- block

  /** Whole-block aggregation of `x` for use inside `groupBy(...).agg(...)`
    * — the reference's `block_transform` path (`aggregate.py:128`,
    * time-period aggregation `owmovingtransform.py:500-534`). */
  def block(key: String, x: Column): Column = {
    val v = nanToNull(x)
    val n = count(lit(1)).cast("double")
    def defined = count(v).cast("double")
    def negs = count(when(v < 0.0, 1))
    def zeros = count(when(v === 0.0, 1))
    key match {
      case "mean"    => avg(v)
      case "sum"     => coalesce(sum(v), lit(0.0))
      case "product" => nanProduct(v)
      case "min"     => min(v)
      case "max"     => max(v)
      case "span"    => max(v) - min(v)
      case "median"  => percentile(v, lit(0.5))
      case "mode"    => modeOf(filter(collect_list(v), x => x.isNotNull))
      case "std"     => stddev_pop(v)
      case "var"     => var_pop(v)
      case "harmonic" =>
        when(defined < n || negs > 0, lit(null).cast("double"))
          .when(zeros > 0, 0.0)
          .otherwise(safeDiv(n, sum(lit(1.0) / nullif(v, lit(0.0)))))
      case "geometric" =>
        when(defined < n || negs > 0, lit(null).cast("double"))
          .when(zeros > 0, 0.0)
          .otherwise(exp(avg(log(v))))
      case "nonzero" => count(when(v =!= 0.0, 1))
      case "defined" => count(v)
      case k => throw new IllegalArgumentException(s"no block form for agg: $k")
    }
  }
}
