package graft.dedup

import graft.similarity.{ProductQuantizer, Similarity}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic (embedding-space) near-duplicate pruning
  * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540). The embedding tier of the
  * dedup stack for cases the lexical tiers can't see: paraphrases,
  * template rewrites, translations — documents whose TEXT differs but
  * whose embeddings nearly coincide.
  *
  * Method (the paper's shape): k-means-cluster the embedding space, then
  * compare pairs only WITHIN a cluster; any document whose cosine
  * similarity to another cluster member exceeds `threshold` is a
  * near-duplicate, and one representative per ε-group is kept. Clustering
  * makes the quadratic step local: O(Σ m_c²) instead of O(N²), with m_c ≈
  * N/k under a reasonable quantizer.
  *
  * Determinism contract (what makes the op gate-able cross-engine):
  *  - the keep rule is canonical, not "random representative": a document
  *    is dropped iff some LOWER-id member of its cluster is within the
  *    ε-ball (`sim ≥ threshold`). Every ε-chain therefore keeps exactly
  *    its members with no earlier neighbor — order-free, join-expressible,
  *    and independent of physical row order on any engine;
  *  - sims are rounded (4dp) BEFORE thresholding, so both engines make
  *    identical boundary decisions (the q57 rule);
  *  - ties in cluster assignment break on lowest centroid id (the PQ
  *    argmin contract).
  *
  * The clusterer is pluggable, same trick as the PQ codebooks
  * ([[ProductQuantizer.fromRows]] / [[ProductQuantizer.trainKMeans]] with
  * `m = 1`, i.e. one subspace spanning the full vector): the gate uses the
  * data-row codebook (a filter+slice in ANSI SQL, so the WHOLE
  * assign → pair → prune pipeline replays in DuckDB), production uses the
  * bounded-sample Lloyd trainer. Assignment itself is the codegen'd
  * [[graft.functions.PqEncodeExpr]] argmin — a scan-stage native
  * expression, never a UDF.
  *
  * Scale shape (100 TB): assignment is a map-side projection; the only
  * shuffle is the cluster-keyed self-join, whose cost is bounded by
  * `maxClusterSize` exactly like the LSH band-bucket cap
  * ([[Dedup.minhashCandidates]]): clusters above the cap skip pairwise
  * pruning (all members kept, `capped = true`) — a mass-duplicate stratum
  * that overwhelms a cluster belongs to the exact/minhash tiers, and at
  * production k (N/1000-ish) healthy clusters sit far below any
  * affordable cap. Sizing rule: maxClusterSize ≈ sqrt(2 ×
  * affordable_pairs_per_cluster).
  *
  * Reference anchor: the reference has no embedding surface
  * (orangecontrib/timeseries is §2 analytics only); this operator is part
  * of the training-data-pipeline family the task brief adds.
  */
object SemDedup {

  /** Deterministic gate clusterer: centroids = the `k` lowest-`idCol`
    * vectors (m=1 PQ codebook over the full dimension). */
  def centroidsFromRows(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): ProductQuantizer.Codebooks =
    ProductQuantizer.fromRows(corpus, idCol, vecCol, m = 1, ksub = k)

  /** Production clusterer: per-full-vector Lloyd k-means on a bounded,
    * deterministically-chosen sample (see [[ProductQuantizer.trainKMeans]]). */
  def centroidsKMeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleN: Int = 65536, maxIter: Int = 10): ProductQuantizer.Codebooks =
    ProductQuantizer.trainKMeans(corpus, idCol, vecCol, m = 1, ksub = k,
      sampleN = sampleN, maxIter = maxIter)

  /** Cluster id of `vec` under an m=1 codebook: squared-L2 argmin over the
    * `k` centroids, ties to the lowest centroid id. */
  def assignCluster(vec: Column, cb: ProductQuantizer.Codebooks): Column = {
    require(cb.m == 1, s"SemDedup clusters over the full vector (m=1), got m=${cb.m}")
    element_at(ProductQuantizer.encode(vec, cb), 1)
  }

  /** Keep/drop verdicts for the whole corpus.
    *
    * Output: (idCol, cluster, kept) — `kept = false` iff a lower-id
    * member of the same (un-capped) cluster has
    * `round(cosine, simScale) ≥ threshold`.
    *
    * `vecCol` must be `array<double>`; pre-normalized unit vectors make
    * `cosine` a plain dot product — pass `normalized = true` to skip the
    * norm division (and its two extra float ops) in the pair stage. */
  def dedup(corpus: DataFrame, idCol: String, vecCol: String,
      cb: ProductQuantizer.Codebooks, threshold: Double,
      normalized: Boolean = false, simScale: Int = 4,
      maxClusterSize: Long = 20000L): DataFrame = {
    // EAGER localCheckpoint at the SCAN (no shuffle — blocks hold the
    // assigned rows as the map stage produced them): the frame is
    // consumed three times (size rollup + both self-join sides + the
    // verdict join) and the k·d argmin encode is the dominant map cost;
    // a lazy checkpoint under the verdict join's potential broadcast
    // side is the documented deadlock inversion (Dedup.minhashCandidates).
    val assigned = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .withColumn("cluster", assignCluster(col("__v"), cb))
      .localCheckpoint(true)
    // flood cap as a TINY broadcast flag (≤ k rows), not a keyed window:
    // a window would shuffle the full vector payload a second time just
    // to count cluster members, and an AQE-coalesced skewed cluster made
    // that stage's worst task 30× the median at probe scale — the
    // groupBy moves only map-combined (cluster, count) rows
    val overCap = assigned.groupBy("cluster")
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxClusterSize)
      .select(col("cluster"), lit(true).as("capped"))
    val sized = assigned.join(broadcast(overCap), Seq("cluster"), "left")
      .withColumn("capped", coalesce(col("capped"), lit(false)))
    val small = sized.filter(!col("capped"))
    val lo = small.select(col("cluster"), col("__id").as("id_lo"), col("__v").as("v_lo"))
    val hi = small.select(col("cluster"), col("__id").as("id_hi"), col("__v").as("v_hi"))
    val sim =
      if (normalized) Similarity.dot(col("v_lo"), col("v_hi"))
      else Similarity.cosine(col("v_lo"), col("v_hi"))
    val dropped = lo.join(hi, Seq("cluster"))
      .filter(col("id_lo") < col("id_hi"))
      .filter(round(sim, simScale) >= threshold)
      .select(col("id_hi").as("__id")).distinct()
      .withColumn("__drop", lit(true))
    sized.join(dropped, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        (col("__drop").isNull || col("capped")).as("kept"))
  }
}
