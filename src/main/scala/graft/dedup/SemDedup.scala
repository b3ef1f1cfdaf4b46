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

  /** Two-level codebooks for large-k clustering: `k1` coarse centroids
    * (`[j·dim + i]`) and `k1·k2` fine centroids (`[(cell·k2 + j)·dim + i]`);
    * global cluster id = coarse·k2 + fine. */
  final case class HierCodebooks(dim: Int, k1: Int, k2: Int,
      coarse: Array[Double], fine: Array[Double])

  /** Hierarchical production clusterer for large `k = k1·k2` — the FAISS
    * coarse-quantizer shape. Flat assignment is O(n·k·d) on the
    * executors, and at a 4M-vector probe doubling k from 4096 to 8192
    * made the assignment scan the dominant stage (~100s of a 194s
    * phase) even as the cluster-local pair work halved; two-level
    * assignment costs O((k1+k2)·d) per row — 42× less arithmetic at
    * k=8192 with k1=128 — while keeping the pair stage's small-cluster
    * benefit. Training: coarse [[ProductQuantizer.lloyd]] on the bounded
    * sample, then an independent Lloyd per coarse cell over the cell's
    * sample members (parallel across cells, deterministic per cell;
    * cells with no sample members inherit their coarse centroid, so
    * assignment stays total). */
  def centroidsKMeansHier(corpus: DataFrame, idCol: String, vecCol: String,
      k1: Int, k2: Int, sampleN: Int = 65536,
      maxIter: Int = 10, knownCount: Option[Long] = None,
      seed: Long = 0L): HierCodebooks = {
    val sample = ProductQuantizer.sampleVectors(corpus, idCol, vecCol, sampleN,
      knownCount, seed)
    require(sample.length >= k1, s"need ≥ k1=$k1 sample vectors")
    val dim = sample.head.length
    val coarseCents = ProductQuantizer.lloyd(sample, 0, dim, k1, maxIter)
    val coarse = new Array[Double](k1 * dim)
    var j = 0
    while (j < k1) {
      System.arraycopy(coarseCents(j), 0, coarse, j * dim, dim); j += 1
    }
    // partition the sample by coarse cell (sequential — preserves the
    // hash-shuffled order inside each cell, so per-cell Lloyd init is
    // deterministic), then train fine centroids per cell in parallel
    val byCell = Array.fill(k1)(new scala.collection.mutable.ArrayBuffer[Array[Double]]())
    sample.foreach { v =>
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k1) {
        var acc = 0.0
        var i = 0
        while (i < dim) { val df = v(i) - coarse(c * dim + i); acc += df * df; i += 1 }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      byCell(best) += v
    }
    val fine = new Array[Double](k1 * k2 * dim)
    java.util.stream.IntStream.range(0, k1).parallel().forEach { c =>
      val cell = byCell(c).toArray
      if (cell.isEmpty) {
        var f = 0
        while (f < k2) {
          System.arraycopy(coarse, c * dim, fine, (c * k2 + f) * dim, dim); f += 1
        }
      } else {
        val cents = ProductQuantizer.lloyd(cell, 0, dim, math.min(k2, cell.length),
          maxIter)
        var f = 0
        while (f < k2) {
          // fewer members than k2 → repeat the last trained centroid so
          // every fine slot is populated (ids stay total; duplicates are
          // never the argmin winner over their twin with a lower id)
          val src = cents(math.min(f, cents.length - 1))
          System.arraycopy(src, 0, fine, (c * k2 + f) * dim, dim)
          f += 1
        }
      }
    }
    HierCodebooks(dim, k1, k2, coarse, fine)
  }

  /** Cluster id under a two-level codebook (coarse argmin, then fine
    * argmin within the chosen cell) — the codegen'd
    * [[graft.functions.HierArgminExpr]]. */
  def assignClusterHier(vec: Column, hcb: HierCodebooks): Column =
    graft.functions.PqFunctions.hierArgmin(vec, hcb.dim, hcb.k1, hcb.k2,
      hcb.coarse, hcb.fine)

  /** Deterministic data-row HIER codebook — the [[ProductQuantizer
    * .fromRows]] trick for the two-level assigner, making the WHOLE
    * hier-assign → pair → prune pipeline SQL-replayable (gate q98):
    * coarse centroids are the `k1` lowest-`idCol` vectors; each cell's
    * fine centroids are the `k2` lowest-id corpus vectors the coarse
    * argmin assigns to that cell (one small Spark job: assignment
    * projection + per-cell id-rank window, ≤ k1·k2 rows collected).
    * Cells with fewer than `k2` members repeat their last centroid
    * (a repeated centroid never beats its lower-id twin under strict
    * `<`, so assignment ids match a SQL argmin over the distinct rows);
    * cells with NO members inherit their coarse centroid. Production
    * uses [[centroidsKMeansHier]]. */
  def centroidsHierFromRows(corpus: DataFrame, idCol: String, vecCol: String,
      k1: Int, k2: Int): HierCodebooks = {
    import org.apache.spark.sql.expressions.Window
    val coarseCb = ProductQuantizer.fromRows(corpus, idCol, vecCol, m = 1, ksub = k1)
    val dim = coarseCb.dsub
    val w = Window.partitionBy(col("__cell")).orderBy(col("__id"))
    val fineRows = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .withColumn("__cell", assignCluster(col("__v"), coarseCb))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k2)
      .select(col("__cell").cast("int"), col("__rk"), col("__v").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1) - 1, r.getSeq[Double](2).toArray))
    val fine = new Array[Double](k1 * k2 * dim)
    // default every slot to the coarse centroid (covers empty cells),
    // then overwrite with the cell's actual members; pad short cells by
    // repeating their LAST member
    var c = 0
    while (c < k1) {
      var f = 0
      while (f < k2) {
        System.arraycopy(coarseCb.flat, c * dim, fine, (c * k2 + f) * dim, dim)
        f += 1
      }
      c += 1
    }
    val maxRk = new Array[Int](k1)
    java.util.Arrays.fill(maxRk, -1)
    fineRows.foreach { case (cell, fid, v) =>
      System.arraycopy(v, 0, fine, (cell * k2 + fid) * dim, dim)
      if (fid > maxRk(cell)) maxRk(cell) = fid
    }
    var c2 = 0
    while (c2 < k1) {
      if (maxRk(c2) >= 0) {
        var f = maxRk(c2) + 1
        while (f < k2) {
          System.arraycopy(fine, (c2 * k2 + maxRk(c2)) * dim,
            fine, (c2 * k2 + f) * dim, dim)
          f += 1
        }
      }
      c2 += 1
    }
    HierCodebooks(dim, k1, k2, coarseCb.flat, fine)
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
      maxClusterSize: Long = 20000L): DataFrame =
    dedupWith(corpus, idCol, vecCol, assignCluster(_, cb),
      threshold, normalized, simScale, maxClusterSize)

  /** [[dedup]] under the two-level clusterer — the large-k path. */
  def dedupHier(corpus: DataFrame, idCol: String, vecCol: String,
      hcb: HierCodebooks, threshold: Double,
      normalized: Boolean = false, simScale: Int = 4,
      maxClusterSize: Long = 20000L): DataFrame =
    dedupWith(corpus, idCol, vecCol, assignClusterHier(_, hcb),
      threshold, normalized, simScale, maxClusterSize)

  private def dedupWith(corpus: DataFrame, idCol: String, vecCol: String,
      clusterOf: Column => Column, threshold: Double,
      normalized: Boolean, simScale: Int,
      maxClusterSize: Long): DataFrame = {
    // EAGER localCheckpoint at the SCAN (no shuffle — blocks hold the
    // assigned rows as the map stage produced them): the frame is
    // consumed three times (size rollup + both self-join sides + the
    // verdict join) and the k·d argmin encode is the dominant map cost;
    // a lazy checkpoint under the verdict join's potential broadcast
    // side is the documented deadlock inversion (Dedup.minhashCandidates).
    val assigned = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .withColumn("cluster", clusterOf(col("__v")))
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
