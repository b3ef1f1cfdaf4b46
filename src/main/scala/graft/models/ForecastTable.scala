package graft.models

import graft.core.{TimeDelta, TimeseriesFrame}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The forecast-table column contract (`models.py:210-228` + SURVEY §1.2):
  * per variable, columns `"<name> (forecast)"`, `"<name> (N%CI low)"`,
  * `"<name> (N%CI high)"`, with the CI linkage carried as column Metadata
  * (`ci_percent`, `ci_attrs`) instead of the reference's name-parsing
  * convention — the Line Chart consumer contract. */
object ForecastTable {

  def asTable(
      spark: SparkSession,
      name: String,
      forecast: Array[Double],
      lo: Array[Double],
      hi: Array[Double],
      confidence: Int = 95): DataFrame = {
    val meanName = s"$name (forecast)"
    val loName = s"$name (${confidence}%CI low)"
    val hiName = s"$name (${confidence}%CI high)"
    val ciMeta = new MetadataBuilder().putLong("ci_percent", confidence).build()
    val meanMeta = new MetadataBuilder()
      .putLong("ci_percent", confidence)
      .putStringArray("ci_attrs", Array(loName, hiName)).build()
    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField(meanName, DoubleType, metadata = meanMeta),
      StructField(loName, DoubleType, metadata = ciMeta),
      StructField(hiName, DoubleType, metadata = ciMeta)))
    val rows = forecast.indices.map(i =>
      Row(i + 1L, forecast(i), lo(i), hi(i)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Line-chart continuation (`owlinechart.py:749-803` re-expressed as a
    * data contract, SURVEY §2.3): history rows tagged `"history"`, forecast
    * rows tagged `"forecast"` with the forecast time axis extrapolated from
    * the last observed time by the series' inferred step (numeric seconds,
    * or calendar months/years via `add_months`). Output columns:
    * (`segment`, `<timeCol>`, `<name>`, `<name> (N%CI low/high)` —
    * null on history rows). */
  def continuation(
      history: TimeseriesFrame,
      valueCol: String,
      forecast: Array[Double],
      lo: Array[Double],
      hi: Array[Double],
      confidence: Int = 95): DataFrame = {
    val spark = history.df.sparkSession
    val tCol = history.timeCol.getOrElse(
      throw new IllegalArgumentException("continuation needs a time column"))
    val loName = s"$valueCol (${confidence}%CI low)"
    val hiName = s"$valueCol (${confidence}%CI high)"
    // eager checkpoint of the SLIM projection (time axis + series keys +
    // the one value column, cast once): the history plan is consumed
    // three ways — the last-time scalar, the step inference (whose
    // range-window lag machinery alone executes its input several
    // times), and the history half of the output. An upstream that is
    // itself an aggregate pipeline (q126's daily means) re-ran 4-5×
    // under the old shape; the blocks hold only the projected columns,
    // the same rows the output must carry anyway.
    val slimCols = (col(tCol) +: history.seriesKeys.map(col)) :+
      col(valueCol).cast("double").as(valueCol)
    val slim = history.df.select(slimCols: _*).localCheckpoint(true)
    val lastT = slim.agg(max(col(tCol))).head()
    require(!lastT.isNullAt(0),
      "continuation needs a non-empty history with at least one non-null time")
    val delta = TimeDelta.infer(slim, tCol, history.seriesKeys)
    val steps = forecast.indices.map(_ + 1)
    val futureTimes: Seq[Column] = delta.deltas.headOption match {
      case Some(Right((k, "month"))) =>
        steps.map(i => add_months(lit(lastT.get(0)), i * k).cast(history.df.schema(tCol).dataType))
      case Some(Right((k, "year"))) =>
        steps.map(i => add_months(lit(lastT.get(0)), i * k * 12).cast(history.df.schema(tCol).dataType))
      case _ =>
        val stepSec = delta.intervalSeconds
          .orElse(delta.gcdSeconds)
          .getOrElse(1.0)
        history.df.schema(tCol).dataType match {
          case _: TimestampType => steps.map(i =>
            timestamp_seconds(unix_timestamp(lit(lastT.get(0))) + lit(i * stepSec)))
          case _: DateType => steps.map(i =>
            timestamp_seconds(
              unix_timestamp(lit(lastT.get(0)).cast(TimestampType)) + lit(i * stepSec))
              .cast(DateType))
          case _ =>
            // getDouble does not widen Integer/Long — go through Number
            val t0 = lastT.getAs[Number](0).doubleValue
            steps.map(i => lit(t0 + i * stepSec))
        }
    }
    val hist = slim.select(
      lit("history").as("segment"), col(tCol),
      col(valueCol),
      lit(null).cast("double").as(loName),
      lit(null).cast("double").as(hiName))
    // one explode over an array of per-step structs instead of h chained
    // single-row unions — same rows, one projection in the plan
    val fut = spark.range(1).select(explode(array(
        forecast.indices.map(i => struct(
          lit("forecast").as("segment"), futureTimes(i).as(tCol),
          lit(forecast(i)).as(valueCol),
          lit(lo(i)).as(loName), lit(hi(i)).as(hiName))): _*)).as("__f"))
      .select(col("__f").getField("segment").as("segment"),
        col("__f").getField(tCol).as(tCol),
        col("__f").getField(valueCol).as(valueCol),
        col("__f").getField(loName).as(loName),
        col("__f").getField(hiName).as(hiName))
    hist.unionByName(fut)
  }
}
