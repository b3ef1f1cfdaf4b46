package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 semantics: hand-computed scores, the null-text N/avgdl contract,
  * rare-term dominance, and the top-k window cut. */
class Bm25Spec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark spark join"),
      (2L, "spark shuffle"),
      (3L, "join join join shuffle"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
  }

  test("score matches the hand-computed BM25 chain") {
    import spark.implicits._
    val idx = Bm25.build(corpus, "doc_id", "text")
    val q = Seq(0 -> "spark").toDF("query_id", "term")
    val out = Bm25.search(idx, q, "query_id", "term", k = 10, scoreScale = 8)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getDouble(r.fieldIndex("score"))).toMap
    // N = 4 (null doc counts), avgdl = (3+2+4+0)/4 = 2.25, df(spark) = 2
    val idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def tfn(tf: Long, len: Long) =
      (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * len / 2.25))
    assert(math.abs(out(1L) - idf * tfn(2, 3)) < 1e-7)
    assert(math.abs(out(2L) - idf * tfn(1, 2)) < 1e-7)
    assert(!out.contains(3L) && !out.contains(4L),
      "docs without the term (or without text) never surface")
  }

  test("rare terms outweigh common ones; top-k cuts and ranks deterministically") {
    import spark.implicits._
    val docs = ((1L to 20L).map(i => (i, "common filler words")) :+
      (21L, "common rare")).toDF("doc_id", "text")
    val idx = Bm25.build(docs, "doc_id", "text")
    val q = Seq(0 -> "common", 0 -> "rare").toDF("query_id", "term")
    val out = Bm25.search(idx, q, "query_id", "term", k = 3)
      .orderBy("rank").collect()
    assert(out.length == 3, "k cut applied")
    assert(out.head.getLong(out.head.fieldIndex("doc_id")) == 21L,
      "the doc containing the rare term ranks first")
    assert(out.map(r => r.getLong(r.fieldIndex("rank"))).toSeq == Seq(1L, 2L, 3L),
      "ranks are 1..k")
  }

  test("maxDfFrac drops corpus-wide terms from scoring, keeps selective ones") {
    import spark.implicits._
    // "common" is in every doc (df = 21/21); "rare" in one
    val docs = ((1L to 20L).map(i => (i, "common filler words")) :+
      (21L, "common rare")).toDF("doc_id", "text")
    val idx = Bm25.build(docs, "doc_id", "text")
    val q = Seq(0 -> "common", 0 -> "rare").toDF("query_id", "term")
    val cutRows = Bm25.search(idx, q, "query_id", "term", k = 100,
      maxDfFrac = 0.5).collect()
    // with "common" cut, only the rare term scores → exactly one hit
    assert(cutRows.length == 1 &&
      cutRows.head.getLong(cutRows.head.fieldIndex("doc_id")) == 21L)
    // a cut that keeps everything reproduces the unpruned result
    val full = Bm25.search(idx, q, "query_id", "term", k = 100).collect()
    val noop = Bm25.search(idx, q, "query_id", "term", k = 100,
      maxDfFrac = 1.0).collect()
    assert(full.map(_.toString).sorted.toSeq == noop.map(_.toString).sorted.toSeq)
  }

  test("disk index round-trips and prunes to the query's buckets") {
    import spark.implicits._
    val docs = ((1L to 50L).map(i => (i, s"w$i common shared")) :+
      (51L, "needle common")).toDF("doc_id", "text")
    val mem = Bm25.build(docs, "doc_id", "text")
    val q = Seq(0 -> "needle", 1 -> "w7").toDF("query_id", "term")
    val expected = Bm25.search(mem, q, "query_id", "term", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25.writeIndex(mem, dir, buckets = 16)
    val disk = Bm25.readIndex(spark, dir)
    val result = Bm25.search(disk, q, "query_id", "term", k = 5)
    assert(result.collect().map(_.toString).sorted.toSeq == expected,
      "disk-backed search ≡ in-memory search")
    // pruning: the postings scan carries a partition filter on bkt
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("bkt"), "bucket partition filter present in plan")
    // the df-cut path also works against the disk dfs table
    val cut = Bm25.search(disk, q, "query_id", "term", k = 5, maxDfFrac = 0.5)
      .collect()
    assert(cut.nonEmpty)
  }

  test("equal scores break ties on doc_id") {
    import spark.implicits._
    val docs = Seq((5L, "x y"), (2L, "x y"), (9L, "x y")).toDF("doc_id", "text")
    val idx = Bm25.build(docs, "doc_id", "text")
    val q = Seq(0 -> "x").toDF("query_id", "term")
    val out = Bm25.search(idx, q, "query_id", "term", k = 2)
      .orderBy("rank").collect().map(r => r.getLong(r.fieldIndex("doc_id")))
    assert(out.toSeq == Seq(2L, 5L))
  }
}
