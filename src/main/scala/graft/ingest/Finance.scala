package graft.ingest

import graft.core.TimeseriesFrame
import org.apache.spark.sql.SparkSession
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
    * [[readOhlcv]] over the dataset's CSV. */
  def readQuandl(
      spark: SparkSession,
      url: String,
      targetCol: String = "Close",
      fetch: String => String = defaultFetch): TimeseriesFrame =
    readOhlcv(spark, url, targetCol, fetch)

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
