package graft.pipeline

import graft.SparkSpec
import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR semantics: multiplicity-preserving hashed features, the smoothed
  * log-ratio weight identity, distribution-shift ranking, and the
  * deterministic top-fraction selection. */
class DsirSpec extends SparkSpec {

  test("ngramBuckets preserves multiplicity and position count") {
    import spark.implicits._
    val df = Seq((1L, "a b a b a")).toDF("id", "text")
    val uni = df.select(TextHash.ngramBuckets(col("text"), 1, 1024))
      .head().getSeq[Long](0)
    val bi = df.select(TextHash.ngramBuckets(col("text"), 2, 1024))
      .head().getSeq[Long](0)
    assert(uni.length == 5, "5 token positions, repeats kept")
    assert(bi.length == 4, "4 bigram positions")
    assert(uni.distinct.length == 2, "two distinct tokens")
    // same chain as shingleHashes: bucket of position 0 = polyHash('a') % B
    assert(uni.head == TextHash.hashString("a") % 1024)
  }

  test("score equals the hand-computed smoothed log-likelihood ratio") {
    import spark.implicits._
    // tiny vocab; B large enough that no buckets collide
    val raw = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val target = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = 4096
    val w = Dsir.bucketWeights(raw, target, "text", b)
    val out = Dsir.score(raw, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // raw features: doc1 = {x:2, y:1, xx:1, xy:1}, doc2 = {y:1, z:1, yz:1}
    //   totals: raw 8, target 5 (doc1 only)
    def lw(ct: Long, cr: Long) =
      (math.log(ct + 1.0) - math.log(5.0 + b)) - (math.log(cr + 1.0) - math.log(8.0 + b))
    val d1 = 2 * lw(2, 2) + lw(1, 2) + lw(1, 1) + lw(1, 1)
    val d2 = lw(1, 2) + lw(0, 1) + lw(0, 1)
    assert(out(1L)._1 == 5 && out(2L)._1 == 3)
    assert(math.abs(out(1L)._2 - d1) < 1e-12, s"${out(1L)._2} vs $d1")
    assert(math.abs(out(2L)._2 - d2) < 1e-12, s"${out(2L)._2} vs $d2")
  }

  test("documents drawn from the target vocabulary outrank background") {
    import spark.implicits._
    // two disjoint vocabularies; raw = 20 background + 5 target-like docs,
    // target = clean target-vocab docs. DSIR must rank every target-like
    // raw doc above every background doc.
    val tgtWords = Seq("alpha", "beta", "gamma", "delta")
    val bgWords = Seq("zork", "quux", "blarg", "wibble")
    def doc(ws: Seq[String], seed: Int, n: Int) =
      (0 until n).map(i => ws((seed * 7 + i * 3) % ws.length)).mkString(" ")
    val raw = ((0 until 20).map(i => (i.toLong, doc(bgWords, i, 12))) ++
      (20 until 25).map(i => (i.toLong, doc(tgtWords, i, 12)))).toDF("doc_id", "text")
    val target = (0 until 6).map(i => (100L + i, doc(tgtWords, i + 3, 15)))
      .toDF("doc_id", "text")
    val w = Dsir.bucketWeights(raw, target, "text", 1024)
    val scored = Dsir.score(raw, "doc_id", "text", w, 1024)
      .withColumn("dsir_logw", round(col("dsir_logw"), 6))
    val ranked = Dsir.topFraction(scored, "doc_id", "dsir_logw", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    val keptIds = ranked.filter(_._3).map(_._1).toSet
    assert(keptIds == Set(20L, 21L, 22L, 23L, 24L),
      s"top-20% of 25 docs = the 5 target-like docs, got $keptIds")
    val ranks = ranked.map(r => r._1 -> r._2).toMap
    assert((20L to 24L).forall(id => ranks(id) <= 5))
  }

  test("bucketWeightsWhere ≡ bucketWeights when target is a raw-subset predicate") {
    import spark.implicits._
    val raw = Seq((1L, "x x y"), (2L, "y z"), (3L, "z z q"), (4L, "x q"))
      .toDF("doc_id", "text")
    val pred = col("doc_id") <= 2
    val a = Dsir.bucketWeights(raw, raw.filter(pred), "text", 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Dsir.bucketWeightsWhere(raw, pred, "text", 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "identical integer counts must give bit-identical weights")
  }

  test("keepAboveQuantile keeps ~frac of the corpus without a global sort") {
    import spark.implicits._
    val scored = (1L to 1000L).map(i => (i, i.toDouble)).toDF("doc_id", "s")
    val kept = Dsir.keepAboveQuantile(scored, "s", 0.2, relErr = 1e-4)
      .filter(col("keep")).collect().map(_.getLong(0))
    // sketch semantics: kept fraction is frac ± accuracy (the cutoff rank
    // can land one element either side of the exact quantile)
    assert(kept.length >= 199 && kept.length <= 201 && kept.min >= 800L,
      s"got ${kept.length} kept, min ${kept.min}")
  }

  test("gopherRules: each Table-A1 rule fires on its construction") {
    import graft.text.TextFunctions
    import spark.implicits._
    val good = ((1 to 60).map(i => s"word$i") ++
      Seq("the", "of", "and")).mkString(" ")
    val docs = Seq(
      1L -> good,                                        // passes everything
      2L -> "the of short",                              // word count
      3L -> good.replace("word1", "w" * 40),             // still passes (mean len shifts little)
      4L -> (good + " " + Seq.fill(20)("###").mkString(" ")), // symbol ratio
      5L -> ((1 to 60).map(i => s"• item$i the of").mkString("\n")), // bullet lines
      6L -> (good.split(" ").map(_ + "...").mkString("\n")), // ellipsis lines
      7L -> ((1 to 60).map(_.toString) ++ Seq("the", "of")).mkString(" "), // alpha words
      8L -> (1 to 60).map(i => s"word$i").mkString(" ")  // no stop words
    ).toDF("doc_id", "text")
    val out = TextFunctions.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, cname: String) = {
      val r = out(id); r.getBoolean(r.fieldIndex(cname))
    }
    assert(b(1L, "keep"), "clean doc keeps")
    assert(!b(2L, "pass_word_count") && !b(2L, "keep"))
    assert(!b(4L, "pass_symbol") && !b(4L, "keep"))
    assert(!b(5L, "pass_lines"), "all-bullet doc fails the line rule")
    assert(!b(6L, "pass_lines"), "all-ellipsis-terminated lines fail")
    assert(!b(7L, "pass_alpha"), "digit-token doc fails the alpha rule")
    assert(!b(8L, "pass_stop") && b(8L, "pass_word_count"))
  }

  test("topFraction keeps ceil(n·frac) with (score, id) tie-breaks") {
    import spark.implicits._
    val scored = Seq((1L, 5L, 1.0), (2L, 5L, 1.0), (3L, 5L, 0.5))
      .toDF("doc_id", "n_feats", "dsir_logw")
    val out = Dsir.topFraction(scored, "doc_id", "dsir_logw", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L), "equal scores break on id")
    assert(out.map(_._3).toSeq == Seq(true, true, false), "ceil(3·0.5) = 2 kept")
  }
}
