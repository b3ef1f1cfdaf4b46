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
}
