package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * plan-review loop (filter pushdown, column pruning, broadcast joins,
  * single-pass windows) captured per round into PLANS_r{N}.md. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q10_timeslice", "q01_sliding_basic", "q06_period_day",
        "q24_nation_revenue", "q37_multiseries_sliding", "q15_dedup_exact",
        "q21_knn_topk", "q89_pq_adc_topk", "q90_lm_perplexity")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
