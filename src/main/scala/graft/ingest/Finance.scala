package graft.ingest

import graft.core.TimeseriesFrame
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import java.nio.file.{Files, Paths, StandardCopyOption}

/** OHLCV ingest connectors — the Spark re-expression of the reference's
  * `finance_data` / `quandl_data` (`orangecontrib/timeseries/
  * datasources.py:14-84`): fetch a CSV over HTTP, parse the Date column as
  * the time variable, and move `Close`/the value column into the target
  * role (`datasources.py:78-80`), encoded here as column metadata.
  *
  * Transport is a pluggable `fetch: String => String` (URL → local path) so
  * the connector is testable offline (`file://`) and swappable for any
  * HTTP client in a connected deployment; the default uses
  * `java.net.URL#openStream`.
  */
object Finance {

  /** Yahoo-Finance-style chart CSV endpoint for a symbol/time range
    * (public URL format; `datasources.py:51-66`). */
  def yahooUrl(symbol: String, sinceEpochSec: Long, untilEpochSec: Long): String =
    s"https://query1.finance.yahoo.com/v7/finance/download/$symbol" +
      s"?period1=$sinceEpochSec&period2=$untilEpochSec&interval=1d&events=history"

  /** Quandl CSV-over-HTTP endpoint with the reference's collapse/transform
    * params (`quandl_data`, `datasources.py:14-48`; the service is defunct
    * — URL format preserved for API parity, readable through the same
    * pluggable transport). `collapse`: none|daily|weekly|monthly|
    * quarterly|annual; `transform`: none|diff|rdiff|cumul|normalize. */
  def quandlUrl(
      dataset: String,
      apiKey: String,
      since: String,
      until: String,
      collapse: String = "daily",
      transform: String = "none"): String =
    s"https://www.quandl.com/api/v3/datasets/$dataset/data.csv" +
      s"?api_key=$apiKey&start_date=$since&end_date=$until" +
      s"&collapse=$collapse&transform=$transform&order=asc"

  /** Quandl-shaped read: same Date-time/target-role rewrite as
    * [[readOhlcv]] over the dataset's CSV, plus the engine-side
    * `collapse`/`transform` param matrix (`datasources.py:14-48` passes
    * them to the service, which applied them SERVER-side; the service is
    * defunct, so API parity requires computing them here — semantics per
    * the published Quandl API docs: collapse keeps the LAST observation
    * of each calendar period re-dated to the period's end;
    * transform is applied AFTER collapse). */
  def readQuandl(
      spark: SparkSession,
      url: String,
      targetCol: String = "Close",
      fetch: String => String = defaultFetch,
      collapse: String = "daily",
      transform: String = "none"): TimeseriesFrame =
    quandlTransform(quandlCollapse(
      readOhlcv(spark, url, targetCol, fetch), collapse), transform)

  /** Quandl `collapse`: one row per calendar period and series, carrying
    * the period's LAST observation, re-dated to the period's last
    * calendar day (monthly → last day of month, quarterly → quarter end,
    * annual → Dec 31, weekly → the following Sunday; none|daily =
    * identity). The keep-latest is a window keyed on (seriesKeys,
    * period) — parallel across periods and series, no global sort. */
  def quandlCollapse(data: TimeseriesFrame, collapse: String): TimeseriesFrame = {
    val t = data.timeCol.getOrElse(
      throw new IllegalArgumentException("quandlCollapse needs a time column"))
    val periodEnd: Column = collapse match {
      case "none" | "daily" => return data
      case "weekly" => next_day(date_sub(col(t), 1), "Sun")
      case "monthly" => last_day(col(t))
      case "quarterly" => last_day(add_months(date_trunc("quarter", col(t)), 2))
      case "annual" => last_day(add_months(date_trunc("year", col(t)), 11))
      case other => throw new IllegalArgumentException(
        s"collapse '$other' not one of none|daily|weekly|monthly|quarterly|annual")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((data.seriesKeys.map(col) :+ col("__pe")): _*)
      .orderBy(col(t).desc)
    val tMd = data.df.schema(t).metadata
    val collapsed = data.df
      .withColumn("__pe", periodEnd.cast("timestamp"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", t)
      .withColumnRenamed("__pe", t)
      // the rename moved the time column to the END and dropped its role
      // metadata; restore original column order + the time role
      .select(data.df.columns.map(c =>
        if (c == t) col(t).as(t, tMd) else col(c)).toSeq: _*)
    data.copy(df = collapsed)
  }

  /** Quandl `transform` over every data column (every non-time column —
    * the service applied it to all value columns): diff = v − v_prev,
    * rdiff = v/v_prev − 1, cumul = running sum, normalize = v/v_first ·
    * 100 (none = identity). diff/rdiff drop each series' first row, as
    * the service did. Windows come from the frame's (seriesKeys, time)
    * spec — per-series lags, no global sort when keys exist; the
    * finance reader path is a single bounded series by nature. */
  def quandlTransform(data: TimeseriesFrame, transform: String): TimeseriesFrame = {
    if (transform == "none") return data
    val t = data.timeCol.getOrElse(
      throw new IllegalArgumentException("quandlTransform needs a time column"))
    val dataCols = data.df.columns.filter(c => c != t && !data.seriesKeys.contains(c))
    val w = data.window
    val run = data.running
    def out(c: String): Column = {
      val md = data.df.schema(c).metadata
      val x = col(c)
      (transform match {
        case "diff" => x - lag(x, 1).over(w)
        case "rdiff" => x / lag(x, 1).over(w) - 1
        case "cumul" => sum(x).over(run)
        case "normalize" => x / first(x).over(run) * 100
        case other => throw new IllegalArgumentException(
          s"transform '$other' not one of none|diff|rdiff|cumul|normalize")
      }).as(c, md)
    }
    val keep = data.df.columns.map(c =>
      if (dataCols.contains(c)) out(c) else col(c))
    val dropFirst = transform == "diff" || transform == "rdiff"
    val result =
      if (dropFirst)
        data.df.select((keep :+ lag(col(t), 1).over(w).as("__prev_t")).toSeq: _*)
          .filter(col("__prev_t").isNotNull).drop("__prev_t")
      else data.df.select(keep.toSeq: _*)
    data.copy(df = result)
  }

  /** Default transport: stream the URL to a temp file, return its path. */
  def defaultFetch(url: String): String = {
    val tmp = Files.createTempFile("graft-ingest", ".csv")
    val in = new java.net.URL(url).openStream()
    try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.toString
  }

  /** Read an OHLCV CSV (Date,Open,High,Low,Close[,Adj Close,Volume]) into a
    * TimeseriesFrame: Date = time variable, `targetCol` marked as target
    * role, everything else a feature. */
  def readOhlcv(
      spark: SparkSession,
      url: String,
      targetCol: String = "Close",
      fetch: String => String = defaultFetch): TimeseriesFrame = {
    val path = if (url.startsWith("http")) fetch(url) else url
    val raw = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(path)
    val cols = raw.schema.fields.map { f =>
      val role =
        if (f.name == targetCol) "target"
        else if (f.name == "Date") "time" else "feature"
      val md = new MetadataBuilder().putString("role", role).build()
      val c = if (f.name == "Date") col(f.name).cast("timestamp")
        else col(f.name).cast("double")
      c.as(f.name, md)
    }
    TimeseriesFrame(raw.select(cols.toSeq: _*), Some("Date")).dropNullTime
  }
}
