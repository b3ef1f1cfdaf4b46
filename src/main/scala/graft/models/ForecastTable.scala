package graft.models

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
}
