package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.text.TextFunctions
/** Dev-only microbench: 4 passes per config, within one JVM. */
object QfBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import F._
    val n = 2000000L
    val filler = concat_ws(" ", (0 until 30).map(i =>
      translate(concat(lit("w"), pmod(hash(col("id") * 37 + lit(i)), lit(1000000))),
        "0123456789", "abcdefghij")): _*)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("the document begins here "), filler).as("text"))
      .localCheckpoint(true)
    def t(tag: String): Unit = {
      val times = (0 until 4).map { _ =>
        val s = System.nanoTime()
        TextFunctions.qualityFilter(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime()-s)/1e9
      }
      println(f"$tag: ${times.map(x => f"$x%.1f").mkString(",")}")
    }
    t("codegen_on")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("wholestage_off")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    t("codegen_on_again")
    spark.stop()
  }
}
