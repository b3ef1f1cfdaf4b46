package graft.pipeline

import graft.functions.TextHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023). Given a small TARGET corpus (the distribution you want — wiki,
  * curated text) and a huge RAW corpus, score every raw document by the
  * log importance weight of its hashed-n-gram features under bag-of-ngram
  * models of the two corpora, then keep the top-weighted fraction: a
  * principled, cheap proxy for "looks like the target distribution".
  *
  * Feature map (the paper's): unigrams + bigrams of lowercased
  * whitespace tokens, hashed into `buckets` counting slots WITH
  * multiplicity ([[graft.functions.NgramBucketsExpr]] — the same
  * deterministic polyhash chain every dedup oracle replays, so the whole
  * pipeline is hash-checkable cross-engine). Bucket distributions are
  * add-1 smoothed; a document's score is
  *
  *   Σ_f  [ ln(c_T[f]+1) − ln(tot_T+B) ] − [ ln(c_R[f]+1) − ln(tot_R+B) ]
  *
  * over its feature occurrences f — exactly ln p_T(doc)/p_R(doc) under
  * the smoothed bag-of-ngram models.
  *
  * Scale shape (100 TB): both corpus passes are explode → map-side-
  * combined counts into at most `buckets` rows (the classic shuffle-light
  * aggregate); the weight table is ≤ `buckets` rows and broadcasts, so
  * scoring is a map-side join + ONE per-document aggregate — the only
  * exchange carries map-combined per-document partials (one row per doc
  * per partition), never documents or features. The paper's resampling
  * step is a deterministic top-fraction selection here ([[topFraction]]);
  * Gumbel noise can be layered on the score column if sampled (rather
  * than top-k) selection is wanted.
  *
  * Reference anchor: no counterpart in orangecontrib/timeseries — part of
  * the training-data-pipeline family the task brief adds.
  */
object Dsir {

  /** Unigram + bigram bucket ids of a document, with multiplicity. */
  def features(text: Column, buckets: Int): Column =
    concat(TextHash.ngramBuckets(text, 1, buckets),
      TextHash.ngramBuckets(text, 2, buckets))

  /** (bucket, cnt) occurrence counts over a corpus; buckets with no
    * occurrences are absent (the weight join coalesces them to 0). */
  def bucketCounts(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(features(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-bucket log importance weight table: (bucket, logw) for every
    * bucket seen in EITHER corpus, plus the out-of-vocabulary weight as a
    * one-row frame (bucket = -1) so scoring needs no literal plumbing.
    * Both log terms subtract their totals inside the row, so `logw` is a
    * per-occurrence additive weight. */
  def bucketWeights(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int): DataFrame = {
    val cr = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("cnt", "cr")
    val ct = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("cnt", "ct")
    val joined = cr.join(ct, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    weightsFromCounts(joined, buckets)
  }

  /** [[bucketWeights]] for the common case where the target corpus is a
    * PREDICATE over the raw corpus (target ⊆ raw): one exploded pass with
    * an `isTarget` flag produces both count columns — half the tokenize/
    * hash work and one corpus scan instead of two. Identical integer
    * counts, so identical weights. */
  def bucketWeightsWhere(raw: DataFrame, isTarget: Column, textCol: String,
      buckets: Int): DataFrame = {
    val counts = raw.filter(col(textCol).isNotNull)
      .select(isTarget.as("t"),
        explode(features(col(textCol), buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"), count(when(col("t"), lit(1))).as("ct"))
    weightsFromCounts(counts, buckets)
  }

  private def weightsFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    // The count table is ≤ `buckets` rows by construction: collect it and
    // build the weight table as a LOCAL relation. Totals, the oov row,
    // and the log arithmetic happen once driver-side — the same
    // java.lang.Math.log double chain the codegen'd column would run, in
    // the same written order, so cross-engine hashes are unchanged — and
    // the result broadcasts with no lineage for the analyzer to rewrite
    // (the BM25 cache-defeat lesson) and no extra jobs (the previous
    // checkpoint + totals-agg + union chain cost three per build).
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val spark = counts.sparkSession
    val rows = counts.collect()
    var tr = 0L
    var tt = 0L
    rows.foreach { r => tr += r.getLong(1); tt += r.getLong(2) }
    val bD = buckets.toDouble
    def lw(ct: Long, cr: Long): Double =
      (math.log(ct + 1.0) - math.log(tt + bD)) -
        (math.log(cr + 1.0) - math.log(tr + bD))
    val out = rows.map(r => Row(r.getLong(0), lw(r.getLong(2), r.getLong(1)))) :+
      Row(-1L, lw(0L, 0L))
    spark.createDataFrame(java.util.Arrays.asList(out: _*),
      StructType(Seq(StructField("bucket", LongType, nullable = false),
        StructField("logw", DoubleType, nullable = false))))
  }

  /** Score every raw document: (idCol, n_feats, dsir_logw). `weights` is
    * a [[bucketWeights]] frame — ≤ buckets+1 rows, broadcast into the
    * feature join so the corpus is never shuffled. Documents with no
    * features (null/empty text) are absent, identically on both engines.
    * The per-document sum is a float fold over ≤ thousands of O(1) terms;
    * consumers should round (≥6dp is far above the reorder noise). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame = {
    // explode → broadcast weight join → one per-doc aggregate: a single
    // exchange of map-combined (doc, partial) rows (an earlier
    // (doc, bucket) pre-count added a second shuffle for nothing — the
    // weight join is bucket-keyed either way). LEFT join + OOV coalesce:
    // a bucket absent from the weight table (scoring a held-out corpus,
    // not the weight-training one) takes the bucket = -1 weight — the
    // same wMap.getOrElse(-1, 0) rule streamingDsirScore applies —
    // instead of silently dropping the feature from both the sum and
    // n_feats (ADVICE r8). The weight table is ≤ buckets+1 local rows by
    // contract, so pre-reading the scalar costs no corpus work.
    val oovLogw = weights.filter(col("bucket") === -1L).select("logw")
      .collect().headOption.map(_.getDouble(0)).getOrElse(0.0)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(features(col(textCol), buckets)).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("logw"), lit(oovLogw))).as("dsir_logw"))
  }

  /** Deterministic EXACT selection: keep the `frac` highest-scoring
    * documents (ties broken by id — scores should be pre-rounded by the
    * caller so the ordering is cross-engine stable). Appends (rank, keep).
    * The global rank window is single-partition — exact-rank output is
    * the small-result path (gate oracles, capped selections); at corpus
    * scale use [[keepAboveQuantile]]. */
  def topFraction(scored: DataFrame, idCol: String, scoreCol: String,
      frac: Double): DataFrame = {
    // the total-row count rides the SAME single-partition pass as the
    // rank window (a separate count() action would force a second full
    // evaluation of the scoring pipeline)
    val k = ceil(count(lit(1))
      .over(Window.partitionBy()) * lit(frac)).cast("long")
    scored.withColumn("rank",
        row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
      .withColumn("keep", col("rank") <= k)
  }

  /** Scale-path selection: keep documents scoring at or above the
    * (1−frac) quantile, found with the mergeable approx-quantile sketch —
    * no global ordering anywhere, so the plan stays shuffle-parallel at
    * any corpus size (kept fraction is `frac` ± the sketch accuracy). */
  def keepAboveQuantile(scored: DataFrame, scoreCol: String, frac: Double,
      relErr: Double = 1e-4): DataFrame = {
    val cut = scored.stat.approxQuantile(scoreCol, Array(1.0 - frac), relErr)(0)
    scored.withColumn("keep", col(scoreCol) >= cut)
  }
}
