package graft.similarity

import graft.functions.{PqFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) — the compression tier
  * of the ANN stack. [[IvfIndex]] prunes WHICH candidates are scored; PQ
  * shrinks WHAT each candidate costs: a d-dim float vector becomes `m`
  * small codes (subspace-wise nearest-centroid ids), and scoring a
  * candidate is `m` table lookups against a per-query LUT instead of a
  * d-element dot product over raw floats.
  *
  * Scale shape (the 100 TB story): the encoded corpus is ~16–64 bytes per
  * vector instead of ~3 KB, so the candidate side of an ANN shuffle drops
  * by two orders of magnitude and a billion-vector index fits executor
  * memory. Codebooks are tiny (m·ksub·dsub doubles) and ride to executors
  * as codegen reference objects; encoding and scoring are scan-stage
  * native expressions ([[graft.functions.PqEncodeExpr]] etc.), never
  * UDFs. Training collects only a BOUNDED sample (FAISS practice: a few
  * 10⁴–10⁵ vectors regardless of corpus size).
  *
  * Reference anchor: the reference has no ANN surface at all
  * (orangecontrib/timeseries covers §2 analytics only); this module is
  * part of the training-data-pipeline family the task brief adds
  * (embedding similarity search at scale).
  */
object ProductQuantizer {

  /** Trained codebooks: `m` subspaces × `ksub` centroids × `dsub` dims,
    * flattened `[(s·ksub + j)·dsub + d]` (the layout every kernel and the
    * SQL oracle share). */
  final case class Codebooks(m: Int, dsub: Int, ksub: Int, flat: Array[Double]) {
    require(flat.length == m * ksub * dsub, s"codebook layout mismatch")
  }

  /** Deterministic data-row codebook: the `ksub` lowest-`idCol` vectors,
    * each split into its `m` subvectors. Quantization quality is below a
    * trained codebook's, but the construction is exactly reproducible in
    * ANSI SQL (a filter + slice), which makes the ENTIRE
    * encode → LUT → ADC → rank pipeline hash-checkable cross-engine — the
    * same pluggable-trainer trick as `Arima.fitFixed` / full-probe IVF
    * (gate q58). Production uses [[trainKMeans]]. */
  def fromRows(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Codebooks = {
    val rows = corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy("id").limit(ksub).collect()
    require(rows.length == ksub, s"need $ksub codebook rows, got ${rows.length}")
    val dim = rows.head.getSeq[Double](1).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val flat = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < ksub) {
      val v = rows(j).getSeq[Double](1)
      var s = 0
      while (s < m) {
        var d = 0
        while (d < dsub) {
          flat((s * ksub + j) * dsub + d) = v(s * dsub + d)
          d += 1
        }
        s += 1
      }
      j += 1
    }
    Codebooks(m, dsub, ksub, flat)
  }

  /** Deterministic bounded training sample WITHOUT a global order-limit:
    * the TakeOrdered plan behind `orderBy(hash).limit(N)` ships every
    * partition's per-partition top-N to the driver — 32 partitions ×
    * 65536 × ~0.5 KB blew spark.driver.maxResultSize at a 2M-vector
    * probe. A hash-threshold filter keeps an EXPECTED 2·sampleN rows
    * (pure function of ids — stable across runs and partitionings),
    * which the driver sorts by (hash, id) and trims to sampleN; the
    * collect is bounded by the sample size, never the corpus. */
  def sampleVectors(corpus: DataFrame, idCol: String, vecCol: String,
      sampleN: Int, knownCount: Option[Long] = None,
      seed: Long = 0L): Array[Array[Double]] = {
    // cast the id to long exactly as fromRows does: getLong on an uncast
    // Integer id threw ClassCastException, silently restricting
    // trainKMeans / SemDedup centroid sampling to LongType ids. The cast
    // is a no-op for long ids, so existing sampled sets (and therefore
    // trained codebooks / gate hashes) are unchanged.
    // `knownCount` skips the sizing count() when the caller already
    // holds the row count (an unpersisted corpus would otherwise pay a
    // full extra scan of the vector projection).
    // `seed = 0` is the legacy unseeded id-hash (bit-identical to every
    // pre-seed build); any other value folds the seed into the hash so
    // seed-varied callers draw genuinely different training samples.
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val h = if (seed == 0L) xxhash64(col("id"))
            else xxhash64(col("id"), lit(seed))
    val total = knownCount.getOrElse(base.count())
    val p = math.max(1L, total / math.max(1L, 2L * sampleN))
    base
      .filter(pmod(h, lit(p)) === 0)
      .select(h.as("h"), col("id"), col("v"))
      .collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
      .take(sampleN)
      .map(_.getSeq[Double](2).toArray)
  }

  /** Deterministic Lloyd over a driver-held sample, restricted to the
    * dims `[off, off + d)` of each row: `k` centroids, init = evenly
    * spaced rows of the (hash-shuffled) sample, empty clusters keep
    * their previous centroid, ties to the lowest centroid id. The
    * O(n·k·d) assignment step runs parallel over samples (pure argmin
    * writes — deterministic); the order-sensitive centroid sums stay
    * sequential. */
  private[graft] def lloyd(sample: Array[Array[Double]], off: Int,
      d: Int, k: Int, maxIter: Int): Array[Array[Double]] = {
    val n = sample.length
    val cents = Array.tabulate(k, d)((j, i) =>
      sample((j.toLong * n / k).toInt)(off + i))
    val assign = new Array[Int](n)
    var it = 0
    while (it < maxIter) {
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var acc = 0.0
          var x = 0
          while (x < d) {
            val diff = sample(i)(off + x) - cents(j)(x)
            acc += diff * diff
            x += 1
          }
          if (acc < bestD) { bestD = acc; best = j }
          j += 1
        }
        assign(i) = best
      }
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val j = assign(i)
        counts(j) += 1
        var x = 0
        while (x < d) { sums(j)(x) += sample(i)(off + x); x += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var x = 0
          while (x < d) { cents(j)(x) = sums(j)(x) / counts(j); x += 1 }
        }
        j += 1
      }
      it += 1
    }
    cents
  }

  /** Production trainer: per-subspace [[lloyd]] on a [[sampleVectors]]
    * sample — only `sampleN` vectors are ever collected, independent of
    * corpus size, and every tie/empty-cluster rule is deterministic, so
    * the same data always yields the same codebooks. */
  def trainKMeans(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, sampleN: Int = 65536, maxIter: Int = 10): Codebooks = {
    val sample = sampleVectors(corpus, idCol, vecCol, sampleN)
    val n = sample.length
    require(n >= ksub, s"need at least ksub=$ksub sample vectors, got $n")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val flat = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      val cents = lloyd(sample, s * dsub, dsub, ksub, maxIter)
      var j = 0
      while (j < ksub) {
        var d = 0
        while (d < dsub) { flat((s * ksub + j) * dsub + d) = cents(j)(d); d += 1 }
        j += 1
      }
      s += 1
    }
    Codebooks(m, dsub, ksub, flat)
  }

  /** Mean squared quantization error of a codebook over a vector column —
    * the k-means training objective, exposed for quality monitoring. */
  def quantizationError(df: DataFrame, vecCol: String, cb: Codebooks): Double = {
    val v = col(vecCol).cast("array<double>")
    val code = PqFunctions.pqEncode(v, cb.m, cb.dsub, cb.ksub, cb.flat)
    // decode-and-diff via LUT identity: |v - q(v)|² = |v|² - 2·adc(lut(v), code) + |q(v)|²
    val lut = PqFunctions.pqLut(v, cb.m, cb.dsub, cb.ksub, cb.flat)
    val cNorms: Array[Double] = {
      val out = new Array[Double](cb.m * cb.ksub)
      var i = 0
      while (i < out.length) {
        var acc = 0.0
        var d = 0
        while (d < cb.dsub) { val x = cb.flat(i * cb.dsub + d); acc += x * x; d += 1 }
        out(i) = acc
        i += 1
      }
      out
    }
    val cn = typedLit(cNorms.toSeq)
    val err = VectorFunctions.dot(v, v) -
      lit(2.0) * PqFunctions.pqAdc(lut, code, cb.ksub) +
      PqFunctions.pqAdc(cn, code, cb.ksub)
    df.select(avg(err)).head().getDouble(0)
  }

  def encode(vec: Column, cb: Codebooks): Column =
    PqFunctions.pqEncode(vec, cb.m, cb.dsub, cb.ksub, cb.flat)

  def lut(qvec: Column, cb: Codebooks): Column =
    PqFunctions.pqLut(qvec, cb.m, cb.dsub, cb.ksub, cb.flat)

  def adc(lutCol: Column, codeCol: Column, cb: Codebooks): Column =
    PqFunctions.pqAdc(lutCol, codeCol, cb.ksub)

  /** [[IvfIndex.Index.assigned]] + a PQ `code` column over the NORMALIZED
    * vector (PQ-for-cosine encodes unit vectors so ADC approximates the
    * cosine directly). The result is the servable IVF-PQ index: persist it
    * and the raw floats are touched only by an optional refine stage. */
  def encodeIndex(index: IvfIndex.Index, cb: Codebooks): DataFrame =
    index.assigned.withColumn("code",
      encode(VectorFunctions.arrayDiv(col("v"), col("nrm")), cb))

  /** Top-k cosine ANN over an IVF-PQ index: probe the `nprobe` nearest
    * cells (same coarse stage as [[IvfIndex.search]]), score candidates by
    * ADC lookups only, and — when `refine > 0` — exactly rescore the top
    * `refine·k` ADC survivors per query with the stored raw vectors
    * (FAISS's IndexRefineFlat shape). `refine = 0` returns pure ADC
    * scores; ranking ties break on `neighbor_id`.
    *
    * Execution semantics with `refine > 0`: the whole search runs EAGERLY
    * at call time and the returned frame is the materialized top-k
    * (`localCheckpoint`, ≤ k rows per query — tiny), NOT a lazy plan.
    * This entry point therefore cannot leak storage: the intermediate
    * refine shortlist is unpinned before returning, and the checkpoint
    * blocks of the result are reclaimed by the ContextCleaner once the
    * frame is unreachable — a batch-serving loop calling `search()`
    * repeatedly holds no permanent CacheManager entries. The trade is
    * lineage: an executor loss after return loses the checkpointed
    * result blocks. Callers that want a lazy, lineage-carrying result
    * with explicit pin lifetime use [[searchManaged]] and run its
    * cleanup once the result is consumed. */
  def search(index: IvfIndex.Index, encoded: DataFrame, queries: DataFrame,
      queryId: String, queryVec: String, cb: Codebooks,
      k: Int, nprobe: Int, refine: Int = 2): DataFrame = {
    val (res, cleanup) = searchManaged(index, encoded, queries, queryId,
      queryVec, cb, k, nprobe, refine)
    if (refine <= 0) res
    else {
      // materialize the k-bounded result, then drop the shortlist pin —
      // nothing persisted by this call survives it (ADVICE r11: the
      // previous delegate-and-discard left one pinned shortlist PER CALL
      // in the CacheManager for the session lifetime)
      val out = res.localCheckpoint(true)
      cleanup()
      out
    }
  }

  /** [[search]] returning `(result, cleanup)`: `cleanup()` unpins the
    * refine shortlist once the result has been materialized (no-op for
    * `refine = 0`, where nothing is pinned). */
  def searchManaged(index: IvfIndex.Index, encoded: DataFrame,
      queries: DataFrame, queryId: String, queryVec: String, cb: Codebooks,
      k: Int, nprobe: Int, refine: Int = 2): (DataFrame, () => Unit) = {
    val spark = queries.sparkSession
    val cents = index.centroids
    val q = queries.select(col(queryId).as("query_id"),
        col(queryVec).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .withColumn("lut", lut(VectorFunctions.arrayDiv(col("qv"), col("qn")), cb))

    val centRows = cents.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }
    val centDf = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val dist = VectorFunctions.l2sq(col("qv"), col("cv"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qv"), col("qn"), col("lut"), col("cell"),
        dist.as("dist"))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("lut"), col("cell"))

    // the candidate explosion is the IVF contract (nprobe/nlist of the
    // index per query) — it must stay NARROW: (query_id, id, lut-scored
    // code) only. Dragging the original vectors through it (the previous
    // refine shape) multiplied the pre-shortlist shuffle by the vector
    // width — measured 12-17x on the 2M probe's refine batches — and at
    // 100 TB would shuffle the corpus' vectors per query batch.
    val cand = probes.join(encoded.select(col("cell"), col("id"), col("code")),
        "cell")
      .filter(col("id") =!= col("query_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val scored = cand.select(col("query_id"), col("id").as("neighbor_id"),
        adc(col("lut"), col("code"), cb).as("score"))
      .withColumn("rank", row_number().over(wAdc))
    if (refine <= 0) {
      (scored.filter(col("rank") <= k), () => ())
    } else {
      // exact rescoring is CANDIDATE-bound: cut to refine·k per query
      // first (eager — consumed by two joins below, one as a broadcast
      // side, and recomputing it would replay the whole ADC pass), then
      // fetch the original vectors via a broadcast semi-join on the
      // shortlist ids so the index side never shuffles (the minhashSearch
      // ref-prune recipe). persist+count, NOT localCheckpoint: lineage
      // survives executor loss, and the caller can unpin.
      val shortIds = scored.filter(col("rank") <= refine.toLong * k)
        .select(col("query_id"), col("neighbor_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      shortIds.count()
      val vecs = encoded
        .select(col("id").as("neighbor_id"), col("v"), col("nrm"))
        .join(broadcast(shortIds.select(col("neighbor_id")).distinct()),
          "neighbor_id")
      val wExact = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      val result = shortIds
        .join(q.select(col("query_id"), col("qv"), col("qn")), "query_id")
        .join(vecs, "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosinePre(col("qv"), col("v"), col("qn"), col("nrm")).as("sim"))
        .withColumn("rank", row_number().over(wExact))
        .filter(col("rank") <= k)
      (result, () => { shortIds.unpersist(); () })
    }
  }
}
