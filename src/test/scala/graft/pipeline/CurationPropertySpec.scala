package graft.pipeline

import graft.SparkSpec
import graft.dedup.SemDedup
import graft.text.Bm25
import org.apache.spark.sql.functions._

/** Property tests for the curation family: results must be invariant to
  * physical layout, agree with from-scratch Scala scoring, and satisfy
  * the operators' algebraic identities. */
class CurationPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260814L)

  private def randText(): String = {
    val vocab = (0 until 40).map(i => s"tok$i")
    (0 until (5 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
  }

  test("BM25: search(k=all) == from-scratch Scala BM25 on a random corpus") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, randText()))
    val df = docs.toDF("doc_id", "text")
    val idx = Bm25.build(df, "doc_id", "text")
    val qTerms = Seq(0 -> "tok3", 0 -> "tok17", 1 -> "tok29", 1 -> "tok5")
    val got = Bm25.search(idx, qTerms.toDF("query_id", "term"),
        "query_id", "term", k = 1000, scoreScale = 8)
      .collect()
      .map(r => (r.getAs[Number](r.fieldIndex("query_id")).longValue,
        r.getLong(r.fieldIndex("doc_id"))) -> r.getDouble(r.fieldIndex("score")))
      .toMap
    // from-scratch reference: plain Scala maps
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.length
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    def df_(t: String) = toks.values.count(_.contains(t))
    def bm25(id: Long, terms: Seq[String]): Double =
      terms.map { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0) 0.0
        else {
          val d = df_(t)
          val idf = math.log((n - d + 0.5) / (d + 0.5) + 1.0)
          idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks(id).length / avgdl))
        }
      }.sum
    for (q <- Seq(0, 1)) {
      val terms = qTerms.filter(_._1 == q).map(_._2)
      for ((id, ts) <- toks if terms.exists(ts.contains)) {
        val expect = bm25(id, terms)
        assert(math.abs(got((q.toLong, id)) - expect) < 1e-7,
          s"query $q doc $id: ${got((q.toLong, id))} vs $expect")
      }
    }
  }

  test("BM25: results invariant under corpus repartitioning") {
    import spark.implicits._
    val docs = (1L to 80L).map(i => (i, randText())).toDF("doc_id", "text")
    val q = Seq(0 -> "tok7", 0 -> "tok11").toDF("query_id", "term")
    def run(parts: Int) =
      Bm25.search(Bm25.build(docs.repartition(parts), "doc_id", "text"),
          q, "query_id", "term", k = 20)
        .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }

  test("SemDedup: exact duplicates always drop; τ>1 keeps everything") {
    import spark.implicits._
    val base = (1L to 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.9 + d) + 0.01 * d)))
    // ids 41-45 duplicate ids 1-5 exactly — identical vectors land in the
    // same cluster under ANY quantizer, so the drop is guaranteed
    val dup = (41L to 45L).map(i => (i, base((i - 41).toInt)._2))
    val corpus = (base ++ dup).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val cb = SemDedup.centroidsFromRows(corpus, "id", "v", k = 4)
    val out = SemDedup.dedup(corpus, "id", "v", cb, threshold = 0.9999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((41L to 45L).forall(id => !out(id)), "exact copies drop")
    assert((1L to 5L).forall(id => out(id)), "originals keep")
    val all = SemDedup.dedup(corpus, "id", "v", cb, threshold = 1.01)
      .collect().map(_.getBoolean(2))
    assert(all.forall(identity), "unreachable threshold keeps everything")
  }

  test("SemDedup hier: exact-duplicate guarantee holds; ids total and stable") {
    import spark.implicits._
    val base = (1L to 300L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.9 + d) + 0.01 * d)))
    val dup = (301L to 305L).map(i => (i, base((i - 301).toInt)._2))
    val corpus = (base ++ dup).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val hcb = SemDedup.centroidsKMeansHier(corpus, "id", "v",
      k1 = 4, k2 = 8, sampleN = 256, maxIter = 5)
    val out = SemDedup.dedupHier(corpus, "id", "v", hcb, threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getBoolean(2)))
    val kept = out.map(r => r._1 -> r._3).toMap
    assert((301L to 305L).forall(id => !kept(id)),
      "identical vectors share a cluster under ANY quantizer → copies drop")
    assert((1L to 5L).forall(kept), "originals keep")
    assert(out.forall(r => r._2 >= 0 && r._2 < 4 * 8), "ids in [0, k1·k2)")
    // determinism: retraining on the same data gives identical verdicts
    val hcb2 = SemDedup.centroidsKMeansHier(corpus, "id", "v",
      k1 = 4, k2 = 8, sampleN = 256, maxIter = 5)
    val again = SemDedup.dedupHier(corpus, "id", "v", hcb2, threshold = 0.9999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(again == kept)
  }

  test("SemDedup: verdicts invariant under corpus repartitioning") {
    import spark.implicits._
    val corpus = (1L to 60L).map(i =>
      (i, Array.tabulate(8)(d => math.cos(i * 0.37 + d * 0.5))))
      .toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val cb = SemDedup.centroidsFromRows(corpus, "id", "v", k = 4)
    def run(parts: Int) =
      SemDedup.dedup(corpus.repartition(parts), "id", "v", cb, threshold = 0.98)
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).sorted.toSeq
    assert(run(1) == run(11))
  }

  test("DSIR: target == raw gives logw 0 everywhere; scores invariant to layout") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, randText())).toDF("doc_id", "text")
    val w = Dsir.bucketWeights(docs, docs, "text", 2048)
    val logws = w.collect().map(_.getDouble(1))
    assert(logws.forall(x => math.abs(x) < 1e-15),
      "identical corpora have importance ratio 1 in every bucket")
    val wt = Dsir.bucketWeightsWhere(docs, col("doc_id") <= 10, "text", 2048)
    def run(parts: Int) =
      Dsir.score(docs.repartition(parts), "doc_id", "text", wt, 2048)
        .withColumn("dsir_logw", round(col("dsir_logw"), 9))
        .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(7))
  }

  test("dedupParagraphs == from-scratch first-wins on random pages, any layout") {
    import spark.implicits._
    val pages = (1L to 80L).map { i =>
      // small paragraph vocab so cross-doc and within-doc dups are dense;
      // ~1 in 6 paragraphs is blank (exempt)
      val ps = (0 until (1 + rnd.nextInt(6))).map { _ =>
        if (rnd.nextInt(6) == 0) "" else s"para${rnd.nextInt(12)}"
      }
      (i, ps.mkString("\n"))
    }
    // from-scratch reference
    val seen = scala.collection.mutable.HashSet[String]()
    val expect = pages.map { case (id, text) =>
      val ps = text.split("\n", -1)
      val kept = ps.filter { p =>
        if (p.trim.isEmpty) true else seen.add(p)
      }
      id -> ((ps.length.toLong, (ps.length - kept.length).toLong,
        kept.mkString("\n")))
    }.toMap
    for (parts <- Seq(1, 7)) {
      val got = graft.dedup.Dedup.dedupParagraphs(
        pages.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      pages.foreach { case (id, _) =>
        val e = expect(id)
        assert(got(id) == e, s"doc $id parts=$parts")
      }
    }
  }
}
