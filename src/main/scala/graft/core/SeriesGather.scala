package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared per-series gather shell behind the executor-side
  * "millions of models" family (PerSeries forecasts, gathered-FFT
  * spectral/ACF, grouped evaluation): each `seriesKeys` group is
  * collected IN TIME ORDER into one row via
  * `sort_array(collect_list(struct(order..., values...)))` — map-side
  * partials, ONE shuffle of the grouped values — and a narrow flatMap
  * consumes the primitive arrays. At 100 TB each series is small even
  * when the table is not; this object is that assumption made reusable
  * (it replaced five hand-rolled copies of the same shell). */
object SeriesGather {

  /** `df` has the key columns plus one sorted `__series` struct array;
    * `xField` is the slot of the FIRST value column inside the struct
    * (order columns occupy slots 0 until xField). */
  final case class Gathered(df: DataFrame, keySchema: StructType, xField: Int)

  /** @param dropNulls filter rows whose FIRST value column is null before
    *   the gather (the spectral/ACF convention); the model shells keep
    *   all rows and let per-series extraction fail into their skip path. */
  def gather(tsf: TimeseriesFrame, valueCols: Seq[String],
      opName: String, dropNulls: Boolean = false): Gathered = {
    require(tsf.seriesKeys.nonEmpty, s"$opName needs seriesKeys")
    val keys = tsf.seriesKeys
    val ordNames = tsf.timeCol.toSeq ++ tsf.tieBreak
    require(ordNames.nonEmpty, s"$opName needs a time column or tieBreak order")
    val orderStruct = struct(
      ordNames.map(c => col(c).cast("double")) ++
        valueCols.map(c => col(c).cast("double")): _*)
    val base =
      if (dropNulls) tsf.df.filter(col(valueCols.head).isNotNull) else tsf.df
    val gathered = base.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(orderStruct)).as("__series"))
    Gathered(gathered, StructType(keys.map(k => gathered.schema(k))), ordNames.size)
  }

  /** The gathered rows as an RDD with at least core-count partitions.
    *
    * Every consumer of this shell follows the gather with CPU-heavy
    * per-series work (model fits, FFTs, triangulations), but AQE sizes
    * the gather's post-shuffle stage by BYTES: a few MB of gathered
    * series coalesce to ONE partition and the whole "millions of models"
    * fan-out silently serializes onto one core (measured on q108: 1500
    * per-series HCT fills in a single 3.2 s task; 0.16 s across 32
    * threads). A Catalyst-side pinned repartition cannot express this —
    * it is pruned as redundant against the gather's own hash exchange —
    * so the guard lives at the RDD layer, where AQE's final partition
    * count is already known: rebalance ONLY when AQE under-partitioned,
    * i.e. exactly when the gathered bytes are small and the extra
    * row-count-balanced shuffle is noise. Large gathers keep their
    * byte-sized partitioning untouched.
    *
    * Measured trade (r9 A/B at sf0.1, local[32]): the extra stage costs
    * ~0.09 s per gathered gate query (q83–q86 moved 0.28→0.41 s, stable
    * across passes) and buys a 20× wall drop the moment per-series work
    * is real (q108's probe).
    *
    * The discriminator is the CALLER's cost class, the one thing the
    * plan cannot see (r9 VERDICT task 2): kernels whose per-series CPU
    * is proportional to the series' BYTES (FFT spectra, ACF — streaming
    * O(n log n) numeric passes) are exactly what AQE's byte-based
    * sizing already balances, so for them the guard stage is pure
    * overhead and `heavyPerSeries = false` skips it. Kernels whose CPU
    * is disproportionate to bytes — iterative model fits, rolling-origin
    * refits, triangulations, spline solves — keep the guard: a few MB
    * of gathered series can hide minutes of CPU, and an
    * under-parallelized model fleet is the failure mode that matters at
    * 100 TB. */
  def rows(g: Gathered, heavyPerSeries: Boolean = true): org.apache.spark.rdd.RDD[Row] =
    rows(g.df, heavyPerSeries)

  /** [[rows]] for gathers not built through [[gather]] (e.g. the
    * multivariate-interpolation matrix gathers). */
  def rows(gathered: DataFrame,
      heavyPerSeries: Boolean): org.apache.spark.rdd.RDD[Row] = {
    val rdd = gathered.rdd
    val par = gathered.sparkSession.sparkContext.defaultParallelism
    if (heavyPerSeries && rdd.getNumPartitions < par) rdd.repartition(par)
    else rdd
  }

  def rows(gathered: DataFrame): org.apache.spark.rdd.RDD[Row] =
    rows(gathered, heavyPerSeries = true)

  /** One-shuffle per-series fill-in-place: gathers each series' FULL rows
    * in series order, hands the per-series value matrix (+ time axis) to
    * `fillFn`, and emits every original row with the returned replacements
    * coalesced in. This replaces the previous gather → fill-RDD →
    * join-back shape, which executed the input scan (and its window
    * stack) TWICE — the fill RDD's lineage re-ran the gather while the
    * join's base side re-ran the scan, with no ReusedExchange across the
    * RDD boundary — and shuffled the full table two more times for the
    * sort-merge join. Here the input is scanned ONCE and shuffled ONCE
    * (the gather itself); at 100 TB that is the difference between one
    * pass over the corpus and three.
    *
    * Value columns are emitted as nullable doubles with NaN normalized to
    * null — exactly the join path's `coalesce(nanToNull(c), fill)`
    * contract; all other columns pass through untouched. Row order within
    * the output is the series order (immaterial to DataFrame semantics).
    *
    * `fillFn(times, vals)`: `times` is the time column cast to double
    * (all-NaN when the frame has no time column), `vals` the row-major
    * matrix of the value columns with null/NaN as NaN. It returns
    * `(rowIdx, replacements)` pairs where a null entry leaves that cell's
    * (null-normalized) original value; unmentioned rows pass through. */
  def fillSeries(tsf: TimeseriesFrame, valueCols: Seq[String], opName: String,
      maxCellsPerSeries: Long)(
      fillFn: (Array[Double], Array[Array[Double]]) => Iterator[(Int, Array[java.lang.Double])]): DataFrame = {
    require(tsf.seriesKeys.nonEmpty, s"$opName needs seriesKeys")
    val df = tsf.df
    val schema = df.schema
    val keys = tsf.seriesKeys
    val ordNames = tsf.timeCol.toSeq ++ tsf.tieBreak
    require(ordNames.nonEmpty, s"$opName needs a time column or tieBreak order")
    val hasT = tsf.timeCol.isDefined
    val o = ordNames.size
    val baseSlot = o
    val valueIdx: Map[String, Int] = valueCols.zipWithIndex.toMap
    val k = valueCols.size
    // struct layout: [sort prefix (ord columns cast to double — the
    // gather() convention; exact for epoch-micro timestamps and ids
    // < 2⁵³), every schema column in order — value columns
    // null-normalized doubles]. The series is sorted JVM-SIDE on the
    // numeric prefix instead of via sort_array, so pass-through columns
    // of NON-ORDERABLE types (maps, structs of maps) gather fine — the
    // old join-back path never gathered them and a sort_array here
    // would reject the whole frame at analysis. Rows tying on the full
    // (time, tieBreak) prefix keep an unspecified relative order, the
    // same nondeterminism the row_number formulation had.
    val cellFields =
      ordNames.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"__o$i") } ++
        schema.fields.toSeq.map { f =>
          if (valueIdx.contains(f.name))
            graft.agg.AggRegistry.nanToNull(col(f.name).cast("double")).as(f.name)
          else col(f.name)
        }
    val gathered = df.groupBy(keys.map(col): _*)
      .agg(collect_list(struct(cellFields: _*)).as("__series"))
    val outSchema = StructType(schema.fields.map { f =>
      if (valueIdx.contains(f.name))
        f.copy(dataType = org.apache.spark.sql.types.DoubleType, nullable = true)
      else f
    })
    val nKeys = keys.size
    val nF = schema.fields.length
    // per-output-field: value-column index, or -1 for pass-through
    val fieldValIdx: Array[Int] =
      schema.fields.map(f => valueIdx.getOrElse(f.name, -1))
    val kSafe = math.max(k, 1).toLong
    // struct slot of each value column (precomputed — not per row)
    val valSlot: Array[Int] =
      valueCols.map(c => baseSlot + schema.fieldIndex(c)).toArray
    val outRdd = rows(gathered).flatMap { row =>
      val unsorted = row.getSeq[Row](nKeys)
      val n = unsorted.length
      require(n * kSafe <= maxCellsPerSeries,
        s"one series has ${n * kSafe} cells > maxCellsPerSeries=$maxCellsPerSeries ($opName)")
      // series order: the double prefix, nulls first (asc nulls-first)
      val series = unsorted.toArray
      java.util.Arrays.sort(series, new java.util.Comparator[Row] {
        override def compare(a: Row, b: Row): Int = {
          var s = 0
          var c = 0
          while (s < o && c == 0) {
            val an = a.isNullAt(s); val bn = b.isNullAt(s)
            c = if (an && bn) 0
            else if (an) -1
            else if (bn) 1
            else java.lang.Double.compare(a.getDouble(s), b.getDouble(s))
            s += 1
          }
          c
        }
      })
      val times = Array.tabulate(n) { i =>
        if (hasT && !series(i).isNullAt(0)) series(i).getDouble(0)
        else Double.NaN
      }
      val vals = Array.tabulate(n, k) { (i, j) =>
        val slot = valSlot(j)
        if (series(i).isNullAt(slot)) Double.NaN else series(i).getDouble(slot)
      }
      val fills = new java.util.HashMap[Int, Array[java.lang.Double]]()
      fillFn(times, vals).foreach { case (i, a) => fills.put(i, a) }
      (0 until n).iterator.map { i =>
        val out = new Array[Any](nF)
        var fi = 0
        while (fi < nF) {
          val j = fieldValIdx(fi)
          if (j >= 0) {
            val f = fills.get(i)
            val repl: java.lang.Double = if (f != null) f(j) else null
            out(fi) =
              // a NaN replacement (e.g. a spline solved on NaN abscissae
              // from null times) normalizes to null like any other NaN —
              // the documented value-column contract
              if (repl != null && !repl.isNaN) repl
              else if (vals(i)(j).isNaN) null
              else Double.box(vals(i)(j))
          } else out(fi) = series(i).get(baseSlot + fi)
          fi += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }
    df.sparkSession.createDataFrame(outRdd, outSchema)
  }

  /** The j-th value column of a gathered row as a primitive array
    * (capture only `xField` in closures — not the Gathered frame). */
  def values(row: Row, xField: Int, j: Int = 0): Array[Double] = {
    val seq = row.getSeq[Row](row.length - 1)
    val arr = new Array[Double](seq.length)
    var i = 0
    seq.foreach { s => arr(i) = s.getDouble(xField + j); i += 1 }
    arr
  }

  /** All `nv` value columns of a gathered row as row-major
    * Array(time)(column) — the multivariate-model layout. */
  def valueRows(row: Row, xField: Int, nv: Int): Array[Array[Double]] =
    row.getSeq[Row](row.length - 1)
      .map(s => Array.tabulate(nv)(j => s.getDouble(xField + j))).toArray

  /** The key column values of a gathered row, in key order. */
  def keyVals(row: Row): Seq[Any] = (0 until row.length - 1).map(row.get)
}
