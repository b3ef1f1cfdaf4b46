package graft.text

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** Pins the r9 regexp_count rewrite of gopherRules' three line/token
  * fractions to the original per-element lambda semantics (higher-order
  * `filter` + `rlike`), on an adversarial corpus: bullets with leading
  * spaces/tabs, unicode ellipsis, whitespace-only and empty lines,
  * letterless tokens, multi-space runs, leading/trailing whitespace,
  * single-line and trailing-newline texts. The lambda forms live HERE as
  * the reference oracle — production keeps only the codegen'd form. */
class GopherCodegenSpec extends SparkSpec {
  import graft.text.TextFunctions

  private val corpus = Seq(
    "the be to of and that have with plain words here",
    "- bullet line\n  - indented bullet\n\t- tab bullet\nplain",
    "• unicode bullet\n* star\n  *lead\nnot-bullet -inline",
    "ends in dots...\nends unicode…\nends spaced...  \nno end... x",
    "...\n…\n...  \nmid...dle",
    "  leading spaces then words  ",
    "123 456 a1 1a2 --- ### w9x",
    "\n\n\nonly empty lines\n\n",
    "   \n \nwhitespace only lines\n ",
    "single",
    "trailing newline ends here\n",
    "tabs\tbetween\ttokens and nbsp",
    "the,punct be! to? of: and; that.",
    "")

  test("regexp_count fractions == lambda-filter fractions on edge corpus") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    // reference implementation: the pre-r9 lambda forms, verbatim
    val t = F.coalesce(F.col("text"), F.lit(""))
    val toks = TextFunctions.tokensLower(t)
    val nWords = F.size(toks).cast("long")
    val nw = nWords.cast("double")
    val lines = F.array_remove(F.split(t, "\n"), "")
    val nLines = F.size(lines).cast("double")
    val refBullet = F.when(F.size(lines) === 0, 0.0).otherwise(
      F.size(F.filter(lines, l => F.trim(l).rlike("^[•\\-\\*]"))).cast("double") / nLines)
    val refEllipsis = F.when(F.size(lines) === 0, 0.0).otherwise(
      F.size(F.filter(lines, l => F.trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines)
    val refAlpha = F.when(nWords === 0, 0.0).otherwise(
      F.size(F.filter(toks, w => w.rlike("[a-z]"))).cast("double") / nw)
    val ref = df.select(F.col("doc_id"),
      F.round(refBullet, 6).as("bullet_frac"),
      F.round(refEllipsis, 6).as("ellipsis_frac"),
      F.round(refAlpha, 6).as("alpha_word_frac"))
      .orderBy("doc_id").collect()

    val got = TextFunctions.gopherRules(df, "doc_id", "text", minWords = 1)
      .select("doc_id", "bullet_frac", "ellipsis_frac", "alpha_word_frac")
      .orderBy("doc_id").collect()

    assert(ref.length == got.length)
    ref.zip(got).foreach { case (r, g) =>
      (1 to 3).foreach { i =>
        assert(r.getDouble(i) == g.getDouble(i),
          s"doc ${r.getLong(0)} col $i: ref=${r.getDouble(i)} got=${g.getDouble(i)} " +
            s"text=${corpus(r.getLong(0).toInt)}")
      }
    }
  }
}
