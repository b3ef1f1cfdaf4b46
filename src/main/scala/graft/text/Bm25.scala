package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", FnTIR 2009; idf in the
  * always-positive Lucene form) — the retrieval tier of the curation
  * stack: retrieval-based decontamination (find training docs matching a
  * benchmark query), seed-similarity mining ("more like these"), and
  * search-quality probes over a candidate corpus.
  *
  * Index build is the classic two-aggregate shape: postings
  * (term, doc, tf) and document lengths, each one map-side-combined
  * explode — the corpus shuffles once, by term, and that IS the inverted
  * index (no driver-side structure). Scoring joins a SMALL query-term
  * frame (broadcast) against postings on the term key, so the per-query
  * cost is proportional to the matched postings, never the corpus; top-k
  * is a per-query window rank.
  *
  *   idf(t)    = ln((N − df + 0.5)/(df + 0.5) + 1)
  *   tfn(t, d) = tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
  *   score     = Σ_t idf·tfn     (rounded by the caller before ranking)
  *
  * Every count is an exact integer and the float chain is written in one
  * fixed order, so the whole pipeline replays in ANSI SQL (gate q94).
  * Tokenization is the corpus-wide whitespace/lowercase contract
  * ([[TextFunctions.tokens]] — the q70 vocabulary surface).
  *
  * Reference anchor: no counterpart in orangecontrib/timeseries — part of
  * the training-data-pipeline family the task brief adds.
  */
object Bm25 {

  /** Inverted index + the per-term and corpus statistics BM25 needs. All
    * four are plain DataFrames — `persist()` for repeated serving (one
    * materialized build amortizes over query batches, the [[graft
    * .similarity.IvfIndex]] lifecycle), or write them out as the index
    * artifact. `stats` is one row: (n_docs, avgdl). */
  final case class Index(postings: DataFrame, docLens: DataFrame,
      dfs: DataFrame, stats: DataFrame) {
    def persist(): Index = {
      postings.persist(); docLens.persist(); dfs.persist(); stats.persist(); this
    }
    def release(): Unit = {
      postings.unpersist(); docLens.unpersist(); dfs.unpersist()
      stats.unpersist(); ()
    }
  }

  /** Build the index. Per-document term frequencies are computed
    * SCAN-SIDE ([[graft.functions.TokenTfExpr]] — one hash map per row),
    * so the postings frame involves NO shuffle at all; the only exchange
    * in the whole build is the tiny term-df rollup (one count row per
    * distinct term, map-side combined). Documents with null/empty text
    * contribute no postings but DO count toward N and avgdl with length 0
    * (they are part of the corpus). */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    val toks = TextFunctions.tokensLower(coalesce(col(textCol), lit("")))
    val lens = docs.select(col(idCol).as("doc_id"),
      size(toks).cast("long").as("len"))
    // postings carry the document length so scoring never joins the
    // corpus-sized docLens frame (+8 bytes/row for a join saved)
    val postings = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("len"),
        explode(graft.functions.TextHash.tokenTf(col(textCol))).as("e"))
      .select(col("doc_id"), col("len"),
        col("e.term").as("term"), col("e.tf").as("tf"))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"))
    Index(postings, lens, dfs, stats)
  }

  /** Persist the index to storage, postings PARTITIONED BY a term-hash
    * bucket: a query batch then reads only its terms' buckets — Spark
    * prunes the other directories at planning time — instead of scanning
    * the full postings (the on-storage serving shape for an index too
    * large to keep hot; the in-memory `persist()` lifecycle covers the
    * hot case). `buckets` sizes the pruning granularity: a B-bucket
    * index serves a t-term batch by reading ≤ min(t, B)/B of the
    * postings. df/lens/stats are written plain (vocabulary-, corpus-,
    * and 1-row-sized respectively). */
  def writeIndex(index: Index, path: String, buckets: Int = 256): Unit = {
    index.postings
      .withColumn("bkt", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .write.partitionBy("bkt").mode("overwrite").parquet(s"$path/postings")
    index.dfs.write.mode("overwrite").parquet(s"$path/dfs")
    index.docLens.write.mode("overwrite").parquet(s"$path/doclens")
    index.stats.withColumn("buckets", lit(buckets))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Reopen a [[writeIndex]] directory as an [[Index]] whose postings
    * carry the partition column; [[search]] on it prunes to the query's
    * buckets automatically (the `bkt IN (...)` filter is injected from
    * the collected term set). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    Index(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/doclens"),
      spark.read.parquet(s"$path/dfs"),
      spark.read.parquet(s"$path/stats"))

  /** Top-`k` documents per query. `queries` is (queryIdCol, termCol) —
    * one row per query term, repeated terms counted once per row (the
    * standard bag-of-terms query model). Scores are rounded to
    * `scoreScale` dp BEFORE ranking and ties break on doc_id, so the
    * ranking is a cross-engine total order.
    *
    * Scoring cost is Σ_t df(t) over the query's terms — a query carrying
    * a corpus-wide term scores EVERY document (at a 1M-doc probe, two
    * such terms in a 100-query batch pushed ~10⁸ (query, doc) pairs
    * through the aggregate). `maxDfFrac < 1` applies the standard
    * query-time stopword cut: terms with df > maxDfFrac·N are dropped
    * from scoring (one extra broadcast-semi-join scan of the df table per
    * batch — the df-threshold shape of the repeated-span/LSH caps). The
    * idf of such terms is near zero, so the cut changes scores by at most
    * ln(1/maxDfFrac)-scale crumbs while removing the quadratic tail;
    * full-fidelity ranking keeps the default 1.0. */
  def search(index: Index, queries: DataFrame, queryIdCol: String,
      termCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      scoreScale: Int = 4, maxDfFrac: Double = 1.0): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(termCol).as("term"))
    // The df table is vocabulary-sized: joined raw it sort-merge-shuffles
    // whole (2.9 GB per 100-query batch at a 34M-posting probe index), so
    // it is SEMI-joined down to the query's terms first — ≤ |query terms|
    // rows by construction. That tiny table and the one-row stats are
    // then COLLECTED and re-injected as local relations (the
    // cosineCandidates shape): keeping them as derived plans defeats the
    // persisted-index cache — when query and index share corpus lineage,
    // the analyzer's self-join dedup rewrites the branch and the cache
    // lookup no longer matches, silently re-deriving the vocabulary
    // rollup on EVERY batch (observed: each probe batch re-paid the full
    // df shuffle). Two driver jobs over cached tiny/1-row frames is the
    // entire cost; the scoring plan's only large input is the postings
    // scan and its only exchange the matched-rows groupBy.
    val st = index.stats.head()
    val nDocs = st.getLong(0)
    val avgdl = if (st.isNullAt(1)) 0.0 else st.getDouble(1)
    // the distinct query-term set is collected to a LOCAL relation before
    // it touches the postings: when the query frame shares lineage with
    // the index's corpus, the analyzer's self-join rewrite can drop the
    // broadcast hint and plan the semi-join as a full sort-merge —
    // observed shuffling all 34M postings (557 MB) per probe batch. A
    // query batch is small by contract (it broadcasts), so the collect
    // is one tiny job.
    val spark = index.postings.sparkSession
    val termSchema = q.select("term").schema
    val termRows0 = q.select("term").distinct().collect()
    val termRows =
      if (maxDfFrac >= 1.0) termRows0
      else {
        // df pre-lookup for the stopword cut: one scan of the df table,
        // semi-joined by the (local) term set so the hint survives
        val all = spark.createDataFrame(
          java.util.Arrays.asList(termRows0: _*), termSchema)
        val cut = (nDocs * maxDfFrac).toLong
        index.dfs.join(broadcast(all), Seq("term"))
          .filter(col("df") <= cut).select("term").collect()
      }
    val qTerms = spark.createDataFrame(
      java.util.Arrays.asList(termRows: _*), termSchema)
    // ONE postings scan per search: the matched postings (≤ Σ df over the
    // query's terms — the classic selective-retrieval bound) are eagerly
    // checkpointed, and BOTH the per-term df counts and the scoring rows
    // derive from those blocks. The index's full df table is not touched
    // at query time at all — deriving df from it re-paid a
    // vocabulary-sized scan per batch (and, when query and index share
    // corpus lineage, the analyzer's self-join dedup defeats the cache
    // lookup and silently re-derives the whole rollup; observed as the
    // full df shuffle on every probe batch). Corpus statistics enter as
    // literals from the one-row stats frame.
    // disk-backed index ([[writeIndex]]): postings carry the partition
    // bucket — restrict the scan to the query's buckets so partition
    // pruning drops every other directory before any I/O (bucket ids are
    // evaluated on the local term relation, no corpus job)
    val postingsIn =
      if (index.postings.columns.contains("bkt")) {
        val nb = st.getAs[Int]("buckets")
        val bkts = qTerms
          .select(pmod(xxhash64(col("term")), lit(nb.toLong)).as("b"))
          .distinct().collect().map(_.getLong(0))
        index.postings.filter(col("bkt").isin(bkts: _*))
      } else index.postings
    val matched = postingsIn
      .join(broadcast(qTerms), Seq("term"))
      .localCheckpoint(true)
    val qDfs = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs) - col("df") + lit(0.5))
      / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / lit(avgdl)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    matched
      .join(broadcast(q), Seq("term"))
      .join(broadcast(qDfs), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(idf * tfn), scoreScale).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
