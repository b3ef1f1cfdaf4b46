package graft.api

import graft.SparkSpec

/** `doc/scripting.md` as an EXECUTABLE spec (VERDICT r10 task 7 — the
  * reference runs `doc/scripting.rst` as a doctest,
  * `tests/test_doctests.py:53-73`): every ```scala block in the doc lives
  * here verbatim between `// doc:begin` / `// doc:end` markers and is
  * compiled + executed with assertions on its results; the final test
  * re-reads both files and fails on ANY divergence, so the published
  * scripting flow can never drift from what actually runs. This doubles
  * as the API-stability contract for the `graft.api.Timeseries` facade.
  */
class DocExamplesSpec extends SparkSpec {

  test("doc/scripting.md: the full scripting flow executes with the documented results") {
    // doc:begin load
    import graft.api.Timeseries
    import graft.ingest.OrangeCsv
    import org.apache.spark.sql.functions._

    // A monthly passenger-count series with trend and a yearly cycle,
    // saved in the Orange three-row-header format and loaded back —
    // the `Timeseries.from_file` flow:
    val raw = spark.range(0, 120).select(
      add_months(to_date(lit("2015-01-01")), col("id").cast("int"))
        .cast("timestamp").as("Month"),
      round(lit(120.0) + col("id") * lit(0.8) +
        lit(40.0) * sin(col("id").cast("double") * lit(math.Pi / 6)), 2)
        .as("Air passengers"))
    OrangeCsv.write(Timeseries.fromColumn(raw, "Month"),
      "/tmp/graft_scripting_passengers.csv")
    val data = Timeseries.fromFile(spark, "/tmp/graft_scripting_passengers.csv")
    // doc:end
    assert(data.timeCol.contains("Month"))
    assert(data.df.count() == 120)

    // doc:begin periodogram
    val pgram = Timeseries.periodogram(data, "Air passengers", detrend = "diff")
    val topPeriod = pgram.orderBy(desc("pgram")).select("period").first.getDouble(0)
    // topPeriod == 11.9: the yearly cycle, landed on the diffed series'
    // discrete frequency grid (119/10 — the reference doc shows the same
    // 11.9 for its monthly data)
    // doc:end
    assert(topPeriod == 11.9, s"dominant period $topPeriod != 11.9")

    // doc:begin autocorrelation
    val acf = Timeseries.autocorrelation(data, "Air passengers")
    val pacf = Timeseries.partialAutocorrelation(data, "Air passengers")
    // acf rows are (lag, acf) at the significant |acf| peaks — the yearly
    // cycle surfaces as a peak at lag 12
    val acfLags = acf.select("lag").collect().map(_.getLong(0)).toSet
    // doc:end
    assert(acfLags.contains(12L), s"no ACF peak at lag 12 in $acfLags")
    assert(pacf.columns.toSeq == Seq("lag", "pacf"))

    // doc:begin interpolate
    // Null out a stretch of values, then fill them back in:
    val gappy = data.copy(df = data.df.withColumn("Air passengers",
      when(month(col("Month")) === 2, lit(null).cast("double"))
        .otherwise(col("Air passengers"))))
    val interpolated = gappy.copy(df =
      Timeseries.interpolateTimeseries(gappy, Seq("Air passengers"),
        method = "cubic"))
    // doc:end
    val filled = interpolated.df.filter(month(org.apache.spark.sql.functions.col("Month")) === 2)
    assert(filled.count() == 10)
    assert(filled.filter(org.apache.spark.sql.functions.col("Air passengers").isNull).count() == 0)

    // doc:begin decompose
    val decomposed = Timeseries.seasonalDecompose(data, Seq("Air passengers"),
      period = 12, model = "multiplicative")
    // appends <col>_adjusted, <col>_seasonal, <col>_trend, <col>_residual
    // doc:end
    Seq("_adjusted", "_seasonal", "_trend", "_residual").foreach { s =>
      assert(decomposed.columns.contains(s"Air passengers$s"), s"missing $s")
    }

    // doc:begin moving
    // 10-month simple moving average of the passenger counts:
    val transformed = Timeseries.movingTransform(data,
      Seq("Air passengers" -> "mean"), width = 10)
    // doc:end
    assert(transformed.columns.contains("Air passengers_mean"))

    // doc:begin arima
    val model = Timeseries.ARIMA((2, 1, 1)).fit(data, "Air passengers")
    val forecast = model.predictAsTable(10)
    // columns: Air passengers (forecast) / (95%CI low) / (95%CI high)
    val errors = model.errors() // keys: r2, mae, rmse, mape, pocid
    // doc:end
    assert(forecast.count() == 10)
    Seq("Air passengers (forecast)", "Air passengers (95%CI low)",
      "Air passengers (95%CI high)").foreach { c =>
      assert(forecast.columns.contains(c), s"missing contract column $c")
    }
    assert(Set("r2", "mae", "rmse", "mape", "pocid").subsetOf(errors.keySet))
    assert(errors("r2") > 0.8, s"in-sample r2 ${errors("r2")} unexpectedly low")

    // doc:begin evaluate
    import graft.models.ModelEvaluation.{ArimaSpec2, VarSpec}
    val scores = Timeseries.modelEvaluation(data, "Air passengers",
      Seq(ArimaSpec2(1, 1, 0), ArimaSpec2(2, 1, 2), VarSpec(1)),
      nFolds = 10, forecastSteps = 3)
    // one row per model plus an "(in-sample)" row each:
    // (model, rmse, mae, mape, pocid, r2, aic, bic)
    // doc:end
    assert(scores.count() == 6)
    assert(scores.columns.toSeq ==
      Seq("model", "rmse", "mae", "mape", "pocid", "r2", "aic", "bic"))

    // doc:begin granger
    // Granger causality on three series where s1 leads s2 by 1 step and
    // s3 by 3 steps, by construction:
    val rolled = spark.range(0, 100).select(
      timestamp_seconds(col("id") * 86400).as("t"),
      col("id").cast("double").as("s1"),
      ((col("id") + 99) % 100).cast("double").as("s2"),
      ((col("id") + 97) % 100).cast("double").as("s3"))
    val gc = Timeseries.grangerCausality(
      Timeseries.fromColumn(rolled, "t"), Seq("s1", "s2", "s3"), maxLag = 10)
    // rows: (lag, p_value, antecedent, consequent) for significant pairs
    // doc:end
    val pairs = gc.select("antecedent", "consequent", "lag").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs.nonEmpty, "granger found no causal pairs")
    assert(pairs.contains(("s1", "s2")) || pairs.contains(("s2", "s1")),
      s"no s1/s2 causality found in $pairs")
  }

  test("doc/scripting.md code blocks are verbatim-identical to the executed regions") {
    def deindent(lines: Seq[String]): Seq[String] = {
      val body = lines.dropWhile(_.trim.isEmpty).reverse.dropWhile(_.trim.isEmpty).reverse
      val pad = body.filter(_.trim.nonEmpty)
        .map(_.takeWhile(_ == ' ').length).minOption.getOrElse(0)
      body.map(l => if (l.length >= pad) l.substring(pad) else l.trim)
    }
    val docPath = java.nio.file.Paths.get("doc/scripting.md")
    val specPath = java.nio.file.Paths.get(
      "src/test/scala/graft/api/DocExamplesSpec.scala")
    val doc = java.nio.file.Files.readString(docPath).linesIterator.toVector
    val spec = java.nio.file.Files.readString(specPath).linesIterator.toVector

    def regions(lines: Vector[String], begin: String => Boolean,
        end: String => Boolean): Vector[Seq[String]] = {
      val out = Vector.newBuilder[Seq[String]]
      var i = 0
      while (i < lines.length) {
        if (begin(lines(i))) {
          val j = lines.indexWhere(end, i + 1)
          assert(j > i, s"unterminated region at line ${i + 1}")
          out += deindent(lines.slice(i + 1, j))
          i = j + 1
        } else i += 1
      }
      out.result()
    }
    val docBlocks = regions(doc,
      l => l.trim == "```scala", l => l.trim == "```")
    val specBlocks = regions(spec,
      l => l.trim.startsWith("// doc:begin"), l => l.trim == "// doc:end")
    assert(docBlocks.nonEmpty, "doc/scripting.md has no ```scala blocks")
    assert(docBlocks.length == specBlocks.length,
      s"doc has ${docBlocks.length} scala blocks, spec executes ${specBlocks.length}")
    docBlocks.zip(specBlocks).zipWithIndex.foreach { case ((d, s), i) =>
      assert(d == s,
        s"block ${i + 1} diverged:\n--- doc ---\n${d.mkString("\n")}\n" +
          s"--- executed ---\n${s.mkString("\n")}")
    }
  }
}
