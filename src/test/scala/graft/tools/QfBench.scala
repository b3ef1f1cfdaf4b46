package graft.tools
import org.apache.spark.sql.{Column, SparkSession, functions => F}
import graft.text.TextFunctions
/** Dev-only microbench: lambda vs regexp_count gopher fracs, interleaved. */
object QfBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import F._
    val n = 2000000L
    val filler = concat_ws(" ", (0 until 60).map(i =>
      translate(concat(lit("w"), pmod(hash(col("id") * 37 + lit(i)), lit(1000000))),
        "0123456789", "abcdefghij")): _*)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("the document begins here and that have with to be of "),
        filler, lit("\n- bullet line\nplain line...")).as("text"))
      .localCheckpoint(true)
    val t = col("text")
    val toks = TextFunctions.tokensLower(t)
    val lines = array_remove(split(t, "\n"), "")
    def lam = struct(
      size(filter(lines, l => trim(l).rlike("^[•\\-\\*]"))),
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))),
      size(filter(toks, w => w.rlike("[a-z]"))))
    def rex = struct(
      regexp_count(t, lit("(?m)^ *[•\\-\\*]")),
      regexp_count(t, lit("(?m)(\\.\\.\\.|…) *$")),
      regexp_count(t, lit("(?:^|(?<=\\s))\\S*?[A-Za-z]")))
    def run(tag: String, c: Column): Unit = {
      val s = System.nanoTime()
      docs.select(col("doc_id"), c.as("v"))
        .write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime()-s)/1e9}%.1fs")
    }
    (0 until 3).foreach { i => run(s"lambda_$i", lam); run(s"regexp_$i", rex) }
    spark.stop()
  }
}
