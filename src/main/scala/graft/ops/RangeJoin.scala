package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — "every (left point, right interval)
  * pair with `start ≤ t < end`" — WITHOUT the plan Spark picks for a raw
  * inequality join (BroadcastNestedLoopJoin: a cross product that dies at
  * scale).
  *
  * Bucketization: intervals explode into the `binWidth`-sized bins they
  * overlap, points map to their single bin, and the pairing becomes an
  * EQUI-join on (keys, bin) followed by the exact containment filter —
  * hash-joinable, shuffle-parallel, skew-handled by AQE like any other
  * equi-join. Each qualifying pair meets in exactly one bin (the point's),
  * so no dedup pass is needed. Choose `binWidth` near the typical interval
  * length: the explode factor is ⌈interval/binWidth⌉+1 and the
  * false-positive filter rate grows as bins get coarser.
  *
  * Inner-join semantics (unmatched points drop); intervals are
  * half-open `[start, end)`.
  */
object RangeJoin {

  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      tCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val t = col(tCol).cast("double")
    val s = col(startCol).cast("double")
    val e = col(endCol).cast("double")
    val lBinned = left.withColumn("__bin", floor(t / binWidth))
    // end is exclusive, but an interval ending exactly on a bin boundary
    // still owns no point there — the explode upper bound uses the last
    // bin any contained point can fall in: floor((end − ulp)/w) ≥
    // floor(start/w) always holds for non-empty intervals
    val rBinned = right
      .filter(e > s)
      .withColumn("__bin",
        explode(sequence(floor(s / binWidth).cast("long"),
          greatest(floor(s / binWidth), ceil(e / binWidth) - 1).cast("long"))))
    lBinned
      .join(rBinned, keys :+ "__bin")
      .filter(t >= s && t < e)
      .drop("__bin")
  }
}
