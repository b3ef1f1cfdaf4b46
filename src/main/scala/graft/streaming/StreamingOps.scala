package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analogues of the batch operators (SURVEY §2.11:
  * the reference is batch-only; these are the natural streaming modes of
  * its aggregation shells — Time Slice playback ≈ a sliding event-time
  * window, time-period aggregation ≈ a tumbling window, sessionization ≈
  * `session_window`). Each takes a streaming DataFrame (`readStream`) and
  * returns a transformed streaming DataFrame for `writeStream`; the same
  * plans also run in batch mode (Spark's unified semantics), which is how
  * they are tested.
  */
object StreamingOps {

  /** Sliding event-time window aggregation with late-data watermark —
    * the streaming Time Slice playback (`owtimeslice.py:343-378`). */
  def slidingWindowAgg(
      stream: DataFrame,
      timeCol: String,
      valueCol: String,
      windowDuration: String,
      slideDuration: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowDuration, slideDuration))
      .agg(count(lit(1)).as("n"), avg(col(valueCol)).as("mean"),
        min(col(valueCol)).as("min"), max(col(valueCol)).as("max"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n"), col("mean"), col("min"), col("max"))

  /** Tumbling calendar-period aggregation — streaming time-period
    * aggregation (`owmovingtransform.py:500-534`). */
  def tumblingPeriodAgg(
      stream: DataFrame,
      timeCol: String,
      valueCol: String,
      period: String,
      watermark: String = "1 hour"): DataFrame =
    slidingWindowAgg(stream, timeCol, valueCol, period, period, watermark)

  /** Event-time session windows per key with an inactivity gap —
    * the streaming form of the batch sessionize query. */
  def sessionAgg(
      stream: DataFrame,
      timeCol: String,
      keyCol: String,
      gap: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark(timeCol, watermark)
      .groupBy(col(keyCol), session_window(col(timeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Streaming exact deduplication: keep the first document per content
    * digest inside the watermark horizon — `dropDuplicates` backed by the
    * streaming state store, the streaming form of `Dedup.exact`. State is
    * bounded by the watermark (`dropDuplicatesWithinWatermark` expires
    * digests once they age out), which is what makes this viable on an
    * unbounded corpus. */
  def streamingDedupExact(
      stream: DataFrame,
      timeCol: String,
      textCol: String,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("__digest", md5(col(textCol).cast("binary")))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming near-dedup: first document per SimHash signature within the
    * watermark — the deterministic 62-bit signature from the batch
    * pipeline ([[graft.dedup.Dedup.simhashFromHashes]]) as a streaming
    * duplicate key. Exact-signature collision is the streaming-friendly
    * tier of near-dup detection (band-joins need a batch pass). */
  def streamingDedupSimhash(
      stream: DataFrame,
      timeCol: String,
      textCol: String,
      watermark: String = "1 hour"): DataFrame = {
    import graft.dedup.Dedup
    import graft.text.TextFunctions
    stream
      .withColumn("__sig",
        Dedup.simhashFromHashes(
          transform(TextFunctions.shingleHashes(col(textCol), 2),
            Dedup.widenHash62(_))))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
  }

  /** Per-key incremental running statistics via arbitrary stateful
    * processing (`flatMapGroupsWithState` — the brief's custom-state
    * primitive): Welford count/mean/variance folded across micro-batches.
    * Emits one updated row per key per batch; the state is O(1) per key
    * regardless of stream length. */
  final case class RunningState(n: Long, mean: Double, m2: Double)
  final case class RunningStats(key: Long, n: Long, mean: Double, variance: Double)

  def statefulRunningStats(
      stream: DataFrame,
      keyCol: String,
      valueCol: String): Dataset[RunningStats] = {
    val typed = stream.select(
      col(keyCol).cast("long").as("key"), col(valueCol).cast("double").as("v"))
      .as(Encoders.product[(Long, Double)])
    typed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Double)],
         state: GroupState[RunningState]) => {
          var st = state.getOption.getOrElse(RunningState(0L, 0.0, 0.0))
          rows.foreach { case (_, v) =>
            val n1 = st.n + 1
            val delta = v - st.mean
            val mean1 = st.mean + delta / n1
            st = RunningState(n1, mean1, st.m2 + delta * (v - mean1))
          }
          state.update(st)
          Iterator.single(RunningStats(key, st.n, st.mean,
            if (st.n == 0) Double.NaN else st.m2 / st.n))
        })(Encoders.product[RunningState], Encoders.product[RunningStats])
  }
}
