package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — "for each left row, the latest right row at or
  * before its time" (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics;
  * not in the reference, which has only positional column-bind, but the
  * canonical time-series enrichment join a production pipeline needs).
  *
  * Spark-first plan: no join at all. Both sides UNION into one frame
  * tagged by origin, sorted by (keys, time, tag) with right rows ordered
  * BEFORE left rows at equal times (inclusive match), and every right
  * payload column is carried forward with `last(_, ignoreNulls = true)`
  * over the running window — one exchange + one window pass, linear in
  * rows. With `keys` nonempty the window partitions per key, so the whole
  * pass is shuffle-parallel (the keyless form is a deliberate
  * single-series operation, same contract as the reference's positional
  * ops). An optional `tolerance` (same units as the time column) nulls
  * out matches older than `t − tolerance`, matching `merge_asof`'s
  * tolerance semantics.
  *
  * Ambiguity contract: if the right side has several rows at the same
  * (keys, time), the LAST one in `rightTie` order wins — pass a tie-break
  * column to make the result deterministic.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      keys: Seq[String] = Nil,
      tolerance: Option[Column] = None,
      rightTie: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_t") && !leftCols.contains("__tag"),
      "reserved column name on the left side")

    // a shared layout: keys, time, tag, left columns (null on right rows),
    // payload columns (null on left rows), right tie-breaks
    val lOut = left.select(
      keys.map(col) ++
        Seq(col(leftTime).cast("double").as("__asof_t"), lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__r_$p")) ++
        rightTie.toSeq.map(_ => lit(null).cast("double").as("__tie")): _*)
    val rOut = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast("double").as("__asof_t"), lit(0).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__r_$p")) ++
        rightTie.toSeq.map(c => col(c).cast("double").as("__tie")): _*)

    val ord = Seq(col("__asof_t"), col("__tag")) ++
      (if (rightTie.nonEmpty) Seq(col("__tie").asc_nulls_last) else Nil)
    val w = (if (keys.isEmpty) Window.orderBy(ord: _*)
             else Window.partitionBy(keys.map(col): _*).orderBy(ord: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lOut.unionByName(rOut.select(lOut.columns.map(col): _*))
      .withColumn("__match_t",
        last(when(col("__tag") === 0, col("__asof_t")), ignoreNulls = true).over(w))
    val filled = payload.foldLeft(carried) { (df, p) =>
      df.withColumn(s"__c_$p",
        last(when(col("__tag") === 0, col(s"__r_$p")), ignoreNulls = true).over(w))
    }
    val inTol = tolerance match {
      case None => col("__match_t").isNotNull
      case Some(tol) =>
        col("__match_t").isNotNull && (col("__asof_t") - col("__match_t")) <= tol
    }
    filled
      .filter(col("__tag") === 1)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          payload.map(p => when(inTol, col(s"__c_$p")).as(p)): _*)
  }
}
