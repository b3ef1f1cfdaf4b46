package graft.ingest

import graft.core.TimeseriesFrame
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Reader for the reference's 3-row-header .csv/.tab format
  * (`Timeseries.from_file`, `timeseries.py:183-186`; see
  * `datasets/airpassengers.csv:1-3`): row 1 = column names, row 2 = type
  * flags (`t` time, `c` continuous, `d` discrete, `s` string), row 3 = role
  * flags (`class`, `meta`, empty = feature).
  *
  * Column roles are carried as column `Metadata` (`role` ∈ feature/target/
  * meta) — the Spark re-expression of Orange's Domain tri-partition
  * (SURVEY §1.3). The first `t` column becomes the time column
  * (`timeseries.py:122-141` auto-detection).
  */
object OrangeCsv {

  def read(spark: SparkSession, path: String, sep: String = ","): TimeseriesFrame = {
    val raw = spark.read
      .option("header", "false").option("sep", sep)
      .csv(path)
    val cols = raw.columns
    val head = raw.limit(3).collect()
    require(head.length == 3, s"$path: expected 3 header rows")
    val names = head(0).toSeq.map(_.toString)
    val types = head(1).toSeq.map(v => Option(v).map(_.toString).getOrElse(""))
    val roles = head(2).toSeq.map(v => Option(v).map(_.toString).getOrElse(""))

    // drop the 3 header rows: everything whose first column is one of the
    // header values won't work for data that repeats them — instead re-read
    // with a monotonic id and skip the first 3 in file order
    val withId = raw.withColumn("__id", monotonically_increasing_id())
    val data = withId.filter(col("__id") >= 3)

    val parsed = names.zipWithIndex.map { case (name, i) =>
      val c = col(cols(i))
      val roleMeta = roles(i) match {
        case "class" => "target"
        case "meta"  => "meta"
        case _       => "feature"
      }
      val md = new MetadataBuilder()
        .putString("role", roleMeta)
        .putString("orangeType", types(i))
        .build()
      val typed = types(i) match {
        case "t" =>
          // Orange TimeVariable accepts partial ISO dates ("1949-01");
          // try_to_timestamp because ANSI to_timestamp throws on mismatch
          coalesce(
            try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
            try_to_timestamp(c, lit("yyyy-MM-dd")),
            try_to_timestamp(concat(c, lit("-01")), lit("yyyy-MM-dd")),
            try_to_timestamp(c))
        case "c" => c.cast("double")
        case _   => c // discrete and string stay strings
      }
      typed.as(name, md)
    }
    val df = data.select((parsed :+ col("__id")): _*)
    val timeCol = types.indexOf("t") match {
      case -1 => None
      case i  => Some(names(i))
    }
    timeCol match {
      case Some(t) => TimeseriesFrame(df, Some(t), Seq("__id")).dropNullTime
      case None    => TimeseriesFrame(df, None, Seq("__id"))
    }
  }

  /** Column names with a given role, in schema order. */
  def colsWithRole(df: DataFrame, role: String): Seq[String] =
    df.schema.fields.filter(f =>
      f.metadata.contains("role") && f.metadata.getString("role") == role)
      .map(_.name).toSeq
}
