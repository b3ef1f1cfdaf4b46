package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE pins: hand-derived merge sequences on engineered frequencies,
  * the deterministic tie-break, greedy lowest-rank encoding, early stop,
  * and the DataFrame train surface. */
class BpeSpec extends SparkSpec {

  test("hand-derived merge sequence on engineered word frequencies") {
    // pair counts: (z,z) = 10 + 4 + 2·1 = 16; then (zz,q) = 4 > (m,n) = 2
    // > (zz,z) = 1
    val merges = Bpe.trainFromWordCounts(
      Seq(("zz", 10L), ("zzq", 4L), ("mn", 2L), ("zzz", 1L)),
      numMerges = 3, minPairCount = 1L)
    assert(merges == Seq(("z", "z"), ("zz", "q"), ("m", "n")))
  }

  test("tie-break: equal counts pick the lexicographically smallest pair") {
    val merges = Bpe.trainFromWordCounts(
      Seq(("cd", 3L), ("ab", 3L)), numMerges = 1, minPairCount = 1L)
    assert(merges == Seq(("a", "b")))
  }

  test("minPairCount stops the loop early") {
    val merges = Bpe.trainFromWordCounts(
      Seq(("ab", 1L), ("ab", 1L)), numMerges = 5, minPairCount = 3L)
    assert(merges.isEmpty)
  }

  test("encode: greedy lowest-rank merge, left-to-right, all occurrences") {
    import spark.implicits._
    val model = Bpe.Model(Seq(("z", "z"), ("zz", "q"), ("m", "n")))
    val got = Seq(Tuple1("zz zzq mn zzz zzzq zq MN"))
      .toDF("t")
      .select(Bpe.tokens(col("t"), model).as("toks"))
      .head().getSeq[String](0)
    // zz→[zz]  zzq→[zzq]  mn→[mn]  zzz→[zz,z] (leftmost first)
    // zzzq→[zz,z,q] ((zz,q) never adjacent)  zq→[z,q]  MN lowercased→[mn]
    assert(got == Seq("zz", "zzq", "mn", "zz", "z",
      "zz", "z", "q", "z", "q", "mn"))
  }

  test("encode: rank order beats position (lower rank wins mid-word)") {
    import spark.implicits._
    // (b,c) rank 0, (a,b) rank 1: "abc" must merge bc first → [a, bc]
    val model = Bpe.Model(Seq(("b", "c"), ("a", "b")))
    val got = Seq(Tuple1("abc")).toDF("t")
      .select(Bpe.tokens(col("t"), model)).head().getSeq[String](0)
    assert(got == Seq("a", "bc"))
  }

  test("train on a DataFrame corpus; model round-trips through a frame") {
    import spark.implicits._
    val docs = Seq.fill(5)("zz zz zzq").map(Tuple1(_)).toDF("text")
      .union(Seq.fill(2)("mn zzq zzz").map(Tuple1(_)).toDF("text"))
    // freqs: zz 10, zzq 7, mn 2, zzz 2 → (z,z) = 10+7+4 = 21;
    // (zz,q) = 7 > (m,n) = 2 = (zz,z)... tie (m,n) < (zz,z) lexicographic
    val m = Bpe.train(docs, "text", numMerges = 4, minPairCount = 2L)
    assert(m.merges == Seq(("z", "z"), ("zz", "q"), ("m", "n"), ("zz", "z")))
    val rt = Bpe.fromDF(m.toDF(spark))
    assert(rt.merges == m.merges)
    val counts = docs.select(Bpe.tokenCount(col("text"), m).as("n"))
      .collect().map(_.getInt(0)).toSeq
    // "zz zz zzq" → 1+1+1; "mn zzq zzz" → 1+1+1 ("zzz"→[zz,z]→(zz,z) merged→[zzz])
    assert(counts == Seq(3, 3, 3, 3, 3, 3, 3))
  }

  test("minCount pre-prunes the long tail: over-maxWords corpus trains, " +
      "disjoint-symbol tail leaves the merge list exactly unchanged") {
    import spark.implicits._
    // head: a real repeated vocabulary over symbols a-j (counts >= 4);
    // tail: 500 distinct count-1 garbage words over DISJOINT symbols
    // k-t (the realistic web shape — typo/unicode junk shares no pair
    // with real text), blowing past a maxWords=100 driver bound
    val head = Seq.fill(4)("abab abab cdcd abab cdcd efef").map(Tuple1(_)).toDF("text")
    val tail = spark.range(500).select(
      translate(concat(lit("k"), col("id")), "0123456789", "klmnopqrst").as("text"))
    val corpus = head.union(tail)
    // without the knob the bounded collect overflows loudly…
    val e = intercept[IllegalArgumentException] {
      Bpe.train(corpus, "text", numMerges = 3, maxWords = 100L)
    }
    assert(e.getMessage.contains("minCount"))
    // …with it the tail dies distributed-side and training completes
    val pruned = Bpe.train(corpus, "text", numMerges = 3,
      maxWords = 100L, minCount = 2L)
    val headOnly = Bpe.train(head, "text", numMerges = 3, maxWords = 100L)
    assert(pruned.merges == headOnly.merges,
      s"pruned-tail merges drifted: ${pruned.merges} vs ${headOnly.merges}")
    assert(pruned.merges.nonEmpty)
  }

  test("minCount = 1 is the identity on the word table (legacy contract)") {
    import spark.implicits._
    val docs = Seq.fill(5)("zz zz zzq").map(Tuple1(_)).toDF("text")
      .union(Seq.fill(2)("mn zzq zzz").map(Tuple1(_)).toDF("text"))
    val a = Bpe.train(docs, "text", numMerges = 4, minPairCount = 2L)
    val b = Bpe.train(docs, "text", numMerges = 4, minPairCount = 2L,
      minCount = 1L)
    assert(a.merges == b.merges)
  }

  test("unseen characters stay single code-point symbols") {
    import spark.implicits._
    val model = Bpe.Model(Seq(("a", "b")))
    val got = Seq(Tuple1("ab😀x")).toDF("t")
      .select(Bpe.tokens(col("t"), model)).head().getSeq[String](0)
    assert(got == Seq("ab", "😀", "x"))
  }
}
