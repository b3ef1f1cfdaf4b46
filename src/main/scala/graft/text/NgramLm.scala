package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based bigram language model with stupid backoff (Brants et al.,
  * "Large Language Models in Machine Translation", EMNLP 2007) — the
  * CCNet-style perplexity quality signal for corpus filtering: documents
  * whose token transitions are improbable under the corpus's own
  * statistics (boilerplate, lexicon soup, OCR noise) score a high
  * perplexity and can be thresholded out.
  *
  * Scale shape: training is two exploded map-side-combined counts
  * (unigrams, bigrams) with a frequency prune — the canonical
  * shuffle-light shape at any corpus size. Scoring never collects the
  * model: document bigrams join the count tables on their keys (Spark
  * broadcasts automatically when the pruned model fits, and falls back to
  * a shuffle join when a 100 TB corpus's model doesn't), then one
  * per-document aggregate folds log-probabilities. Everything is
  * DataFrame-declarative — Catalyst sees every join key and filter.
  *
  * Score definition (deterministic, SQL-replicable):
  *   S(w2|w1) = c(w1,w2)/c(w1)      if the bigram survived the prune
  *            = α · S(w2)            otherwise (backoff)
  *   S(w2)    = c(w2)/N             if w2 seen, else 1/N
  *   doc_logp = mean over the doc's bigram positions of ln S
  *   ppl      = exp(−doc_logp)
  */
object NgramLm {

  /** A trained model: pruned bigram counts, full unigram counts, and the
    * corpus token total. The count frames are plain DataFrames — persist
    * them for repeated scoring, or write them out as the model artifact. */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame, totalTokens: Long)

  /** Tokens of `textCol`, lowercased — identical to the vocabulary
    * surface (q70): whitespace split, empties dropped. */
  private def toks(textCol: String) = TextFunctions.tokens(lower(col(textCol)))

  /** Adjacent-pair view of a document: one row per bigram position
    * (single explode over a transform — no positional self-join). */
  private def bigramsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), toks(textCol).as("t"))
      .where(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("bg"))
      .select(col(idCol), col("bg.w1"), col("bg.w2"))

  /** Train on a corpus: unigram counts, bigram counts pruned to
    * `minBigramCount`, and the token total. */
  def train(docs: DataFrame, textCol: String, minBigramCount: Long = 2L): Model = {
    // Deliberately LAZY count frames (r15 A/B): an eager-checkpoint
    // variant (the trainKneserNey recipe — blocks for uni/bi, total from
    // blocks) was measured at gate scale and REVERTED: it trades one
    // corpus tokenization pass for three extra driver jobs and the block
    // write, and q90's bench moved 0.67→0.95 s (2.0× its floor). Stupid
    // backoff has only two model consumers and ReuseExchange already
    // dedupes the unigram rollup inside the scoring join, so the extra
    // pass here is ONE tokenize of the corpus — cheaper than the
    // materialization at every scale the bench can see. Callers with
    // many scoring batches should `Model.{unigrams,bigrams}.persist()`
    // (the documented serving lifecycle) rather than pay a checkpoint
    // per train.
    val uni = docs.select(explode(toks(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bi = bigramsOf(docs.withColumn("__id", lit(0L)), "__id", textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minBigramCount)
    val total = uni.agg(sum("c1")).head().getLong(0)
    Model(uni, bi, total)
  }

  /** Per-document stupid-backoff log-probability and perplexity.
    * Output: (idCol, n_bigrams, avg_logp, ppl) for every document with at
    * least one bigram. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      model: Model, alpha: Double = 0.4): DataFrame = {
    val n = model.totalTokens.toDouble
    val pairs = bigramsOf(docs, idCol, textCol)
    val scored = pairs
      .join(model.bigrams.withColumnRenamed("c2", "cBi"), Seq("w1", "w2"), "left")
      .join(model.unigrams.withColumnRenamed("w", "w1")
        .withColumnRenamed("c1", "cW1"), Seq("w1"), "left")
      .join(model.unigrams.withColumnRenamed("w", "w2")
        .withColumnRenamed("c1", "cW2"), Seq("w2"), "left")
      .withColumn("logp",
        when(col("cBi").isNotNull && col("cW1").isNotNull,
          log(col("cBi") / col("cW1")))
        .otherwise(log(lit(alpha) * coalesce(col("cW2"), lit(1L)) / lit(n))))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }

  /** Interpolated Kneser–Ney bigram model (Kneser & Ney 1995) — the
    * smoothing KenLM uses and CCNet's filter is built on, as the exact
    * counterpart to [[Model]]'s stupid backoff. Probabilities are pure
    * count ratios plus one discount constant, so the whole model replays
    * as SQL counts and joins (the q90 determinism recipe):
    *
    *   p(w2|w1) = max(c(w1,w2)−D, 0)/ch(w1) + D·nf(w1)/ch(w1) · pc(w2)
    *   pc(w2)   = np(w2)/T          (continuation probability)
    *
    * with ch(w1) = Σ_w c(w1,w) the bigram-HEAD count (not the unigram
    * count — heads exclude document-final tokens, and only the head sum
    * makes Σ_w2 p(w2|w1) = 1 exactly), nf(w1) = |{w : c(w1,w)>0}|,
    * np(w2) = |{w : c(w,w2)>0}|, T = bigram type count. Unseen contexts
    * fall back to pc alone; unseen w2 gets the 1/(V+1) floor. The three
    * count frames all derive from one grouped bigram count — persist
    * `bigrams` before training-time reuse, or write the frames out as
    * the model artifact (the [[Model]] scale notes apply unchanged). */
  final case class KnModel(bigrams: DataFrame, follow: DataFrame,
      prec: DataFrame, bigramTypes: Long, vocabSize: Long, discount: Double) {
    /** Materialize the three count frames for repeated scoring (the
      * [[graft.similarity.IvfIndex]] persist/release lifecycle): without
      * it every score pass re-derives all three from the raw corpus. The
      * gate rebuilds per query by design — the oracle must see the
      * build — so steady-state cost is pinned by spec, not the bench. */
    def persist(): KnModel = {
      bigrams.persist(); follow.persist(); prec.persist(); this
    }
    def release(): Unit = {
      bigrams.unpersist(); follow.unpersist(); prec.unpersist()
    }
  }

  /** Train an interpolated KN bigram model on a corpus. No count pruning:
    * discounting already reserves mass via D, and pruning would break the
    * sum-to-one identity the spec pins. */
  def trainKneserNey(docs: DataFrame, textCol: String,
      discount: Double = 0.75): KnModel = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    // eager checkpoint of the grouped bigram table: every model surface
    // derives from it — follow, prec, the type count, and the scoring
    // join — and without blocks each SEPARATE action re-tokenizes the
    // corpus (ReusedExchange only dedupes consumers inside one job; the
    // type count here and the caller's scoring action are different
    // jobs). The blocks hold one row per distinct bigram — the model
    // artifact itself, which persist() would pin anyway — and the
    // ContextCleaner frees them when the model is dropped.
    // r16: the bigram-type count (`types`) comes out of the checkpoint's
    // own materializing job — the separate count() on the just-written
    // blocks was one driver job per train
    val (bi, types) = org.apache.spark.sql.graftbridge.Bridge
      .localCheckpointWithCount(
        bigramsOf(docs.withColumn("__id", lit(0L)), "__id", textCol)
          .groupBy("w1", "w2").agg(count(lit(1)).as("c2")))
    val follow = bi.groupBy("w1")
      .agg(count(lit(1)).as("nFollow"), sum("c2").as("cHead"))
    val prec = bi.groupBy("w2").agg(count(lit(1)).as("nPrec"))
    // countDistinct ≡ distinct().count() value-wise, one aggregate job
    val vocab = docs.select(explode(toks(textCol)).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    KnModel(bi, follow, prec, types, vocab, discount)
  }

  /** Per-document interpolated-KN log-probability and perplexity — same
    * output contract as [[perplexity]]: (idCol, n_bigrams, avg_logp, ppl)
    * for every document with at least one bigram. Scoring never collects
    * the model: three key joins (broadcast when the model fits) and one
    * per-document aggregate. */
  def kneserNeyPerplexity(docs: DataFrame, idCol: String, textCol: String,
      model: KnModel): DataFrame = {
    val d = model.discount
    val types = model.bigramTypes.toDouble
    val oovFloor = 1.0 / (model.vocabSize + 1.0)
    val pairs = bigramsOf(docs, idCol, textCol)
    val scored = pairs
      .join(model.bigrams.withColumnRenamed("c2", "cBi"), Seq("w1", "w2"), "left")
      .join(model.follow, Seq("w1"), "left")
      .join(model.prec, Seq("w2"), "left")
      .withColumn("pCont", coalesce(col("nPrec") / lit(types), lit(oovFloor)))
      .withColumn("logp", log(
        when(col("cHead").isNotNull,
          greatest(coalesce(col("cBi"), lit(0L)) - lit(d), lit(0.0)) / col("cHead") +
            lit(d) * col("nFollow") / col("cHead") * col("pCont"))
          .otherwise(col("pCont"))))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
  }

  /** Keep/drop verdict at a perplexity ceiling: documents scoring above
    * `maxPpl` (or too short to score) are dropped. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      model: Model, maxPpl: Double, alpha: Double = 0.4): DataFrame = {
    val scores = perplexity(docs, idCol, textCol, model, alpha)
      .select(col(idCol), col("ppl"))
    docs.join(scores, Seq(idCol), "left")
      .withColumn("keep", col("ppl").isNotNull && col("ppl") <= maxPpl)
  }
}
