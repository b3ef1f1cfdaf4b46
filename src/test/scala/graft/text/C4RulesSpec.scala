package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4 cleaning pins (Raffel et al. 2020 §2.2): kernel line rules branch
  * by branch, the page-verdict bundle, SQL registration, and the
  * codegen contract (the kernel is a real doGenCode expression, so a
  * filter on `keep` must stay inside a WholeStageCodegen span — the
  * HOF-pushdown trap this design exists to avoid). */
class C4RulesSpec extends SparkSpec {

  private def clean(text: String, minWords: Int = 3): (String, Long, Long) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("t")
      .select(TextFunctions.c4Clean(col("t"), minWords).as("c"))
      .select("c.clean", "c.n_kept", "c.n_dropped").head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("line rules: terminal punctuation, word minimum, javascript, trim") {
    // kept: terminal . ! ? " with >= 3 words
    assert(clean("one two three.") == ("one two three.", 1L, 0L))
    assert(clean("does it work?\nyes it does!") ==
      ("does it work?\nyes it does!", 2L, 0L))
    assert(clean("he said \"stop right there\"") ==
      ("he said \"stop right there\"", 1L, 0L))
    // dropped: no terminal punct / too few words / javascript any case
    assert(clean("no terminal punctuation") == ("", 0L, 1L))
    assert(clean("ok.") == ("", 0L, 1L))
    assert(clean("please enable JAVAscript to continue.") == ("", 0L, 1L))
    // trim: leading/trailing horizontal whitespace removed, then judged
    assert(clean("   padded line stays fine.  \t") ==
      ("padded line stays fine.", 1L, 0L))
    // blank and whitespace-only lines count as dropped
    assert(clean("good first sentence here.\n\n   \nsecond good one too.") ==
      ("good first sentence here.\nsecond good one too.", 2L, 2L))
    // minWords is a parameter
    assert(clean("two words.", minWords = 2) == ("two words.", 1L, 0L))
    // empty page: one split segment, dropped
    assert(clean("") == ("", 0L, 1L))
  }

  test("page verdicts: sentences, lorem ipsum, curly brace, blocklist") {
    import spark.implicits._
    val five = "a good one.\nb good two.\nc good three.\nd good four.\ne good five."
    val docs = Seq(
      (1L, five),                                  // keep
      (2L, five.replace("e good five.", "e good")),// 4 sentences → drop
      (3L, five + "\nsneaky Lorem Ipsum footer"),  // lorem (dropped line, page veto)
      (4L, five + "\ncode { brace"),               // curly veto
      (5L, five + "\nbad banned word included.")   // blocklist veto
    ).toDF("doc_id", "text")
    val out = TextFunctions.c4Rules(docs, "doc_id", "text",
      blocklist = Seq("banned"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(9)).toSeq ==
      Seq(true, false, false, false, false))
    assert(out(0).getLong(4) == 5L) // n_sentences
    assert(out(1).getBoolean(5) == false) // pass_sentences
    assert(out(2).getBoolean(6) == false) // pass_lorem
    assert(out(3).getBoolean(7) == false) // pass_curly
    assert(out(4).getBoolean(8) == false) // pass_blocklist
    // the lorem footer line has no terminal punct → also dropped as a line
    assert(out(2).getString(1) == five)
    // passThrough carries upstream columns without a join-back
    val pt = TextFunctions.c4Rules(
      docs.withColumn("extra", col("doc_id") * 10), "doc_id", "text",
      passThrough = Seq("extra"))
      .orderBy("doc_id").collect()
    assert(pt(0).schema.fieldNames.take(3).toSeq ==
      Seq("doc_id", "extra", "text_clean"))
    assert(pt.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L, 40L, 50L))
  }

  test("c4_clean registered for SQL; keep-filter stays in codegen") {
    import spark.implicits._
    // register on the live session the same way GraftExtensions does
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_c4_clean",
      exprs => graft.functions.C4CleanExpr(exprs.head,
        if (exprs.length > 1)
          exprs(1).eval().asInstanceOf[java.lang.Number].intValue else 3),
      "scala_udf")
    val df = Seq((1L, "alpha beta gamma.\nnope")).toDF("id", "t")
    df.createOrReplaceTempView("c4probe")
    val r = spark.sql(
      "SELECT graft_c4_clean(t).clean AS c, graft_c4_clean(t, 2).n_kept AS k " +
        "FROM c4probe").head()
    assert(r.getString(0) == "alpha beta gamma.")
    assert(r.getLong(1) == 1L)
    // RDD-backed frame so ConvertToLocalRelation can't fold the plan away
    val five = "a one two.\nb one two.\nc one two.\nd one two.\ne one two."
    val rdd = spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(1L, five), org.apache.spark.sql.Row(2L, "nope")), 2)
    import org.apache.spark.sql.types._
    val docs = spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType), StructField("t", StringType))))
    val filtered = TextFunctions.c4Rules(docs, "id", "t").filter(col("keep"))
    assert(filtered.count() == 1L)
    // `*(n)` prefixes mark WholeStageCodegen spans; the pushed-down keep
    // predicate must carry them (a CodegenFallback kernel would strip
    // the star from the Filter and Project nodes)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter") && plan.contains("*(1) Project"),
      s"keep-filter fell out of codegen:\n$plan")
  }
}
