package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the nearest right row in time"
  * (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics; not in the
  * reference, which has only positional column-bind, but the canonical
  * time-series enrichment join a production pipeline needs).
  *
  * Spark-first plan: no join at all. Both sides UNION into one frame
  * tagged by origin, sorted by (keys, time, tag) with right rows ordered
  * adjacent to their matching left rows (inclusive at equal times), and
  * every right payload column is carried with `last(_, ignoreNulls=true)`
  * over the running window — one exchange + one window pass per
  * direction, linear in rows. With `keys` nonempty the window partitions
  * per key, so the whole pass is shuffle-parallel (the keyless form is a
  * deliberate single-series operation, same contract as the reference's
  * positional ops).
  *
  * Directions: `backward` (latest right at or before t — default),
  * `forward` (earliest right at or after t), `nearest` (closer of the
  * two; exact-distance ties resolve backward). An optional `tolerance`
  * (same units as the time column) nulls out matches farther than
  * `tolerance` from t.
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
      rightTie: Option[String] = None): DataFrame =
    join(left, right, leftTime, rightTime, payload, keys, tolerance,
      rightTie, "backward")

  def join(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      keys: Seq[String] = Nil,
      tolerance: Option[Column] = None,
      rightTie: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got: $direction")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_t") && !leftCols.contains("__tag"),
      "reserved column name on the left side")

    // a shared layout: keys, time, tag, left columns (null on right rows),
    // payload columns (null on left rows), right tie-break
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
    val unioned = lOut.unionByName(rOut.select(lOut.columns.toIndexedSeq.map(col): _*))

    // one carry pass per direction: scan order puts right rows before the
    // left rows they can match (inclusive at equal times); among same-time
    // right rows the largest tie-break scans last and wins
    def carry(df: DataFrame, sfx: String, descending: Boolean): DataFrame = {
      val ord =
        if (descending)
          Seq(col("__asof_t").desc, col("__tag").asc) ++
            rightTie.toSeq.map(_ => col("__tie").asc_nulls_last)
        else
          Seq(col("__asof_t").asc, col("__tag").asc) ++
            rightTie.toSeq.map(_ => col("__tie").asc_nulls_last)
      val w = (if (keys.isEmpty) Window.orderBy(ord: _*)
               else Window.partitionBy(keys.map(col): _*).orderBy(ord: _*))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withT = df.withColumn(s"__mt$sfx",
        last(when(col("__tag") === 0, col("__asof_t")), ignoreNulls = true).over(w))
      payload.foldLeft(withT) { (acc, p) =>
        acc.withColumn(s"__c${sfx}_$p",
          last(when(col("__tag") === 0, col(s"__r_$p")), ignoreNulls = true).over(w))
      }
    }

    val carried = direction match {
      case "backward" => carry(unioned, "_b", descending = false)
      case "forward"  => carry(unioned, "_f", descending = true)
      case "nearest"  => carry(carry(unioned, "_b", descending = false),
        "_f", descending = true)
    }

    def dist(mt: Column): Column = abs(col("__asof_t") - mt)
    def within(mt: Column): Column = tolerance match {
      case None => mt.isNotNull
      case Some(tol) => mt.isNotNull && dist(mt) <= tol
    }
    val (useB, useF) = direction match {
      case "backward" => (within(col("__mt_b")), lit(false))
      case "forward"  => (lit(false), within(col("__mt_f")))
      case "nearest"  =>
        // closer side wins; exact ties resolve backward
        val b = within(col("__mt_b"))
        val f = within(col("__mt_f"))
        val bWins = b && (!f || dist(col("__mt_b")) <= dist(col("__mt_f")))
        (bWins, f && !bWins)
    }
    carried
      .filter(col("__tag") === 1)
      .select(
        keys.map(col) ++
          leftCols.filterNot(keys.contains).map(col) ++
          payload.map(p => (direction match {
            case "backward" => when(useB, col(s"__c_b_$p"))
            case "forward"  => when(useF, col(s"__c_f_$p"))
            case "nearest"  => when(useB, col(s"__c_b_$p"))
              .when(useF, col(s"__c_f_$p"))
          }).as(p)): _*)
  }
}
