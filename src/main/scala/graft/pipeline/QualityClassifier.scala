package graft.pipeline

import graft.functions.{BucketDotExpr, TextHash}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FastText-style linear quality classifier — the "train a small linear
  * model on curated-vs-crawl labels, keep what scores curated" filter of
  * the GPT-3 / LLaMA data recipes (Brown et al. 2020 §A; Touvron et al.
  * 2023 use the same shape with a fastText model). Features are the
  * DSIR hashed bag of n-grams ([[Dsir.features]]: unigrams + bigrams
  * with multiplicity into `buckets` counting slots), so one feature
  * pipeline serves both importance weighting and classification.
  *
  * Two halves with different physics:
  *
  *  - [[train]] is the BOUNDED side: MLlib logistic regression over
  *    sparse count vectors. Each iteration is one treeAggregate of
  *    gradient partials (vector-sized, ≤ `buckets` doubles per
  *    partition partial); the fitted model is `buckets + 1` doubles —
  *    driver-size at any corpus scale, like every codebook here.
  *    Training sets are label-limited (~10⁵ curated pages), not
  *    corpus-scale.
  *  - [[score]] is the CORPUS side and must be scan-stage: the weight
  *    vector broadcasts (8 B · buckets ≈ 2 MB at 2¹⁸) and the logit is
  *    one codegen'd expression ([[graft.functions.BucketDotExpr]]) over
  *    the feature array — no explode, no join, no shuffle; 100 TB
  *    scores in one pass. (A weight-table join — the [[Dsir.score]]
  *    shape — computes the same sum but shuffles per-doc partials;
  *    with a vector that fits a broadcast, the expression wins.)
  *
  * Determinism note (the gate relies on this): scoring is
  * Σ w[bucket] + bias in ARRAY ORDER. With integer-valued weights the
  * double sum is exact (order-free below 2⁵³), which is how q121 hashes
  * the logit cross-engine against an integer-arithmetic oracle; the
  * trained path's float weights are spec-verified instead (training is
  * iterative floating-point — not SQL-replayable, the q58/q92 fitFixed
  * precedent). */
object QualityClassifier {

  /** A fitted (or constructed) linear model over the hashed-n-gram
    * feature space: `logit(doc) = bias + Σ_occurrences w[bucket]`. */
  final case class Model(buckets: Int, bias: Double, weights: Array[Double]) {
    require(weights.length == buckets,
      s"weights length ${weights.length} != buckets $buckets")
  }

  /** Per-document logit under `model`, as one scan-stage expression over
    * the text column. */
  def logit(text: Column, model: Model, spark: SparkSession): Column = {
    val bc = spark.sparkContext.broadcast(model.weights)
    BucketDotExpr(Dsir.features(text, model.buckets), bc) + lit(model.bias)
  }

  /** Score a corpus: appends `logit`, `prob` (sigmoid), and the binary
    * `keep` verdict (logit > 0). One projection — no shuffle. */
  def score(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val lg = logit(col(textCol), model, docs.sparkSession)
    docs.withColumn("logit", lg)
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("keep", col("logit") > 0.0)
  }

  /** Fit the classifier on labeled documents (`labelCol`: 1.0 = keep /
    * curated, 0.0 = reject / crawl). Sparse count vectors are built with
    * one explode + per-(doc, bucket) count — the only shuffle, bounded
    * by the labeled set, not the corpus. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 1 << 18, maxIter: Int = 50,
      regParam: Double = 1e-4): Model = {
    val feats = trainingVectors(docs, textCol, labelCol, buckets)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val fit = lr.fit(feats)
    val w = new Array[Double](buckets)
    fit.coefficients.foreachActive((i, v) => w(i) = v)
    Model(buckets, fit.intercept, w)
  }

  /** One `(label, features)` row PER DOCUMENT, features = sparse count
    * vector of the doc's hashed n-grams (multiplicity preserved).
    * Exposed for the doc-level-semantics spec: the row id MUST be
    * materialized in a projection BELOW the Generate — ExtractGenerator
    * hoists non-generator expressions into the project above the
    * explode, so an id assigned in the same select as `explode()` is
    * re-evaluated per exploded occurrence, and every n-gram occurrence
    * would train as its own single-feature "document". */
  private[pipeline] def trainingVectors(docs: DataFrame, textCol: String,
      labelCol: String, buckets: Int): DataFrame = {
    val b = buckets
    val toVec = udf { pairs: Seq[org.apache.spark.sql.Row] =>
      val sorted = pairs.map(r => (r.getLong(0).toInt, r.getLong(1).toDouble))
        .sortBy(_._1)
      Vectors.sparse(b, sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    }
    docs.filter(col(textCol).isNotNull)
      .withColumn("__row", monotonically_increasing_id())
      .select(col(labelCol).cast("double").as("label"),
        col("__row"),
        explode(Dsir.features(col(textCol), b)).as("bucket"))
      .groupBy(col("__row"), col("label"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("__row"), col("label"))
      .agg(collect_list(struct(col("bucket"), col("cnt"))).as("pairs"))
      .select(col("label"), toVec(col("pairs")).as("features"))
  }
}
