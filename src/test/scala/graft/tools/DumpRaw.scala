package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
/** Dev-only probe: dump UNROUNDED spectral values for boundary-margin
  * analysis (q81 determinism work). Not a test; run via Test/runMain. */
object DumpRaw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val t0 = graft.core.TimeseriesFrame.fromColumn(
      graft.SparkEntry.tbl(spark, dir, "events"), "ts", Seq("event_id"))
    val t = t0.withSeriesKeys("user_id")
    def dump(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/raw/$name")
    dump(graft.spectral.Periodogram.spectrumByKeyFft(t, "value", "diff")
      .select(F.col("user_id"), F.col("period"), F.col("power")), "q81")
    dump(graft.spectral.Periodogram.spectrumByKey(t, "value", "diff")
      .select(F.col("user_id"), F.col("period"), F.col("power")), "q48")
    dump(graft.spectral.Periodogram.spectrumByKey(t, "value", "quadratic")
      .select(F.col("user_id"), F.col("period"), F.col("power")), "q76")
    dump(graft.spectral.Correlation.acfByKeyFft(t, "value", maxLag = 6)
      .select(F.col("user_id"), F.col("lag"), F.col("acf")), "q83")
    dump(graft.spectral.Correlation.pacfByKeyFft(t, "value", maxLag = 8)
      .select(F.col("user_id"), F.col("lag"), F.col("pacf")), "q84")
    dump(graft.spectral.Correlation.acfConfintByKey(t, "value", alpha = 0.05, maxLag = 6)
      .select(F.col("user_id"), F.col("lag"), F.col("acf"), F.col("ci_low"), F.col("ci_high")), "q85")
    val withT = t.copy(df = t.df.withColumn("tsec", F.col("ts").cast("double")),
      timeCol = Some("tsec")).withSeriesKeys("user_id")
    dump(graft.spectral.Periodogram.lombSpectrumByKey(withT, "value", nPeriods = 60)
      .select(F.col("user_id"), F.col("period"), F.col("power")), "q49")
    spark.stop()
  }
}
