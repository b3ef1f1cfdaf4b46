package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  test("train separates planted curated-vs-crawl labels; score is scan-stage") {
    import spark.implicits._
    // curated docs carry editorial vocabulary, crawl docs carry spam
    // vocabulary; shared filler makes the problem non-trivial but
    // linearly separable
    val docs = (0L until 200L).map { i =>
      val shared = s"common filler words page number ${i % 7} section"
      if (i % 2 == 0)
        (i, s"$shared thoughtful analysis citations methodology results", 1.0)
      else
        (i, s"$shared click here buy cheap pills winner prize", 0.0)
    }.toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(docs, "text", "label",
      buckets = 1 << 12, maxIter = 60)
    assert(model.weights.length == (1 << 12))
    val scored = QualityClassifier.score(docs, "text", model)
      .select(col("doc_id"), col("label"), col("keep"), col("logit"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getDouble(3)))
    // perfect separation on the training set (separable by construction)
    scored.foreach { case (id, label, keep, logit) =>
      assert(keep == (label == 1.0), s"doc $id: label=$label logit=$logit")
    }
    // prob is the sigmoid of the logit
    val probs = QualityClassifier.score(docs, "text", model)
      .select(col("logit"), col("prob")).collect()
    probs.foreach { r =>
      assert(math.abs(r.getDouble(1) -
        1.0 / (1.0 + math.exp(-r.getDouble(0)))) < 1e-12)
    }
    // the scoring plan is one projection: no exchange, no join
    val plan = QualityClassifier.score(docs, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("trainingVectors: one vector PER DOC, multi-occurrence counts > 1") {
    import spark.implicits._
    // "red red red red" repeats one unigram 4× and one bigram 3×; if the
    // row id were evaluated per exploded occurrence (the ExtractGenerator
    // hoist bug), each occurrence would become its own single-feature row
    val docs = Seq(
      (1L, "red red red red", 1.0),
      (2L, "blue green yellow", 0.0),
      (3L, "one two one two one", 1.0)).toDF("doc_id", "text", "label")
    val feats = QualityClassifier.trainingVectors(docs, "text", "label", 1 << 10)
      .collect()
    // exactly one training row per document, not per n-gram occurrence
    assert(feats.length == 3, feats.mkString("\n"))
    val vecs = feats.map(r => (r.getDouble(0),
      r.getAs[org.apache.spark.ml.linalg.Vector](1)))
    // doc 1: some feature (the "red" unigram) must carry count >= 4
    val maxCounts = vecs.map(_._2.toArray.max)
    assert(maxCounts.exists(_ >= 4.0),
      s"no multi-occurrence count survived: ${maxCounts.toSeq}")
    // every vector's total mass = total n-gram occurrences of its doc
    // (doc 1: 4 unigrams + 3 bigrams = 7)
    val masses = vecs.map(_._2.toArray.sum).sorted.toSeq
    assert(masses.contains(7.0), s"masses: $masses")
  }

  test("BucketDotExpr logit ≡ explode-join weight-table sum") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"alpha beta gamma token${i % 11} delta token${i % 5}"))
      .toDF("doc_id", "text")
    val b = 512
    // arbitrary (but integer-valued, hence order-free) weights
    val w = Array.tabulate(b)(j => ((j * 97) % 41 - 20).toDouble)
    val model = QualityClassifier.Model(b, 3.0, w)
    val viaExpr = QualityClassifier.score(docs, "text", model)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val wDf = w.toSeq.zipWithIndex.map { case (v, j) => (j.toLong, v) }
      .toDF("bucket", "w")
    val viaJoin = docs
      .select(col("doc_id"),
        explode(Dsir.features(col("text"), b)).as("bucket"))
      .join(wDf, "bucket")
      .groupBy("doc_id").agg(sum("w").as("s"))
      .select(col("doc_id"), (col("s") + lit(3.0)).as("logit"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(viaExpr == viaJoin)
    // empty-feature doc: logit = bias alone
    val empty = Seq((99L, "   ")).toDF("doc_id", "text")
    val e = QualityClassifier.score(empty, "text", model)
      .select("logit").head().getDouble(0)
    assert(e == 3.0)
  }
}
