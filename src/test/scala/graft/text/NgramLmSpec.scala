package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM pins: hand-computed stupid-backoff goldens on a tiny corpus,
  * the prune threshold's effect, the filter verdict contract, and
  * finiteness over the real documents table. */
class NgramLmSpec extends SparkSpec {

  private def tiny = {
    import spark.implicits._
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c c"),
      (4L, "solo"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
  }

  test("hand-computed stupid-backoff scores on a tiny corpus") {
    val m = NgramLm.train(tiny, "text", minBigramCount = 2)
    assert(m.totalTokens == 10L) // a:3 b:3 c:3 solo:1
    val bi = m.bigrams.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(bi == Map(("a", "b") -> 3L)) // (b,a),(b,c),(c,c) pruned at 2

    val got = NgramLm.perplexity(tiny, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc1 bigrams: (a,b) ln(3/3)=0, (b,a) backoff ln(0.4*3/10), (a,b) 0
    val backA = math.log(0.4 * 3 / 10.0)
    val d1 = (0.0 + backA + 0.0) / 3
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - d1) < 1e-12)
    assert(math.abs(got(1L)._3 - math.exp(-d1)) < 1e-9)
    // doc2: (a,b) 0, (b,c) backoff ln(0.4*3/10)
    val d2 = (0.0 + backA) / 2
    assert(math.abs(got(2L)._2 - d2) < 1e-12)
    // doc3: (c,c) backoff ln(0.4*3/10)
    assert(math.abs(got(3L)._2 - backA) < 1e-12)
    // doc4 (one token) and doc5 (null) have no bigrams → absent
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("unpruned model scores kept bigrams as exact count ratios") {
    val m = NgramLm.train(tiny, "text", minBigramCount = 1)
    val got = NgramLm.perplexity(tiny, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc3: (c,c) kept, c appears 3 times, pair once → ln(1/3)
    assert(math.abs(got(3L) - math.log(1.0 / 3)) < 1e-12)
    // doc1: ln(3/3), ln(1/3), ln(3/3)
    assert(math.abs(got(1L) - math.log(1.0 / 3) / 3) < 1e-12)
  }

  test("qualityFilter verdict: threshold applied, short docs dropped") {
    val m = NgramLm.train(tiny, "text", minBigramCount = 2)
    val ppl1 = NgramLm.perplexity(tiny, "doc_id", "text", m)
      .filter(col("doc_id") === 1L).head().getDouble(3)
    val kept = NgramLm.qualityFilter(tiny, "doc_id", "text", m, maxPpl = ppl1 + 0.01)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept(1L))       // at/below ceiling
    assert(!kept(4L) && !kept(5L)) // unscoreable → dropped
    val none = NgramLm.qualityFilter(tiny, "doc_id", "text", m, maxPpl = 0.5)
      .filter(col("keep")).count()
    assert(none == 0L)
  }

  test("real documents: every scored doc finite, coverage = docs with >= 2 tokens") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = NgramLm.train(d, "text")
    val scored = NgramLm.perplexity(d, "doc_id", "text", m)
    val bad = scored.filter(col("ppl").isNull || isnan(col("ppl")) ||
      col("ppl") <= 0.0).count()
    assert(bad == 0L)
    val eligible = d.filter(size(TextFunctions.tokens(lower(col("text")))) >= 2).count()
    assert(scored.count() == eligible)
  }

  // ---- interpolated Kneser–Ney --------------------------------------

  // tiny-corpus KN facts (D = 0.75): bigrams (a,b):3 (b,a):1 (b,c):1
  // (c,c):1, T = 4 types; follow a→(1,3) b→(2,2) c→(1,1); prec a→1 b→1
  // c→2; V = 4 → OOV floor 1/5. All ratios are exact in binary.
  test("hand-computed interpolated-KN probabilities on the tiny corpus") {
    val m = NgramLm.trainKneserNey(tiny, "text")
    assert(m.bigramTypes == 4L && m.vocabSize == 4L)
    val got = NgramLm.kneserNeyPerplexity(tiny, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pBgA = 0.8125 // (3-.75)/3 + .75*1/3 * 1/4
    val pAgB = 0.3125 // (1-.75)/2 + .75*2/2 * 1/4
    val pCgB = 0.5    // (1-.75)/2 + .75*2/2 * 2/4
    val pCgC = 0.625  // (1-.75)/1 + .75*1/1 * 2/4
    val d1 = (math.log(pBgA) + math.log(pAgB) + math.log(pBgA)) / 3
    val d2 = (math.log(pBgA) + math.log(pCgB)) / 2
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - d1) < 1e-14)
    assert(math.abs(got(2L)._2 - d2) < 1e-14)
    assert(math.abs(got(3L)._2 - math.log(pCgC)) < 1e-14)
    assert(!got.contains(4L) && !got.contains(5L)) // < 2 tokens → unscored
  }

  test("KN probabilities sum to exactly 1 over the continuation vocab") {
    import spark.implicits._
    val m = NgramLm.trainKneserNey(tiny, "text")
    // every seen context × every continuation-seen word (np > 0)
    val contexts = m.follow.select("w1").as[String].collect()
    val cont = m.prec.select("w2").as[String].collect()
    val probe = contexts.flatMap(w1 => cont.map(w2 => (w1, s"$w1 $w2")))
      .zipWithIndex.map { case ((w1, txt), i) => (i.toLong, w1, txt) }
      .toSeq.toDF("doc_id", "ctx", "text")
    val p = NgramLm.kneserNeyPerplexity(probe, "doc_id", "text", m)
      .withColumn("p", exp(col("avg_logp")))
    val sums = probe.join(p, "doc_id").groupBy("ctx").agg(sum("p").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    contexts.foreach { w1 =>
      assert(math.abs(sums(w1) - 1.0) < 1e-12,
        s"sum over continuations for context '$w1' = ${sums(w1)}")
    }
  }

  test("KN unseen-context and OOV branches fall back to continuation/floor") {
    import spark.implicits._
    val m = NgramLm.trainKneserNey(tiny, "text")
    val probe = Seq((1L, "solo b"), (2L, "zzz c"), (3L, "a qqq"))
      .toDF("doc_id", "text")
    val got = NgramLm.kneserNeyPerplexity(probe, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // 'solo' occurs but never as a bigram head; 'zzz' is fully unknown:
    // both contexts fall back to pc alone
    assert(math.abs(got(1L) - math.log(1.0 / 4)) < 1e-14) // pc(b) = 1/4
    assert(math.abs(got(2L) - math.log(2.0 / 4)) < 1e-14) // pc(c) = 2/4
    // OOV continuation after a seen head: discounted mass times the floor
    val pQgA = math.max(0.0 - 0.75, 0.0) / 3 + 0.75 * 1 / 3.0 * (1.0 / 5)
    assert(math.abs(got(3L) - math.log(pQgA)) < 1e-14)
  }

  test("KN on real documents: finite, and sharper than stupid backoff on seen text") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = NgramLm.trainKneserNey(d, "text")
    val scored = NgramLm.kneserNeyPerplexity(d, "doc_id", "text", m)
    val bad = scored.filter(col("ppl").isNull || isnan(col("ppl")) ||
      col("ppl") <= 0.0).count()
    assert(bad == 0L)
    val eligible = d.filter(size(TextFunctions.tokens(lower(col("text")))) >= 2).count()
    assert(scored.count() == eligible)
  }

  test("KN persist lifecycle: persisted model scores identically") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cold = NgramLm.trainKneserNey(d, "text")
    val warm = NgramLm.trainKneserNey(d, "text").persist()
    try {
      val a = NgramLm.kneserNeyPerplexity(d, "doc_id", "text", cold)
        .orderBy("doc_id").collect()
      val b = NgramLm.kneserNeyPerplexity(d, "doc_id", "text", warm)
        .orderBy("doc_id").collect()
      assert(a.toSeq == b.toSeq)
    } finally warm.release()
  }
}
