package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor primitives over an embedding column
  * (`array<float>`): brute-force cosine top-k as the correctness baseline,
  * and random-hyperplane LSH bucketing as the scale path.
  *
  * Scale design: the query side is always broadcast (queries ≪ corpus);
  * the corpus is scanned once, similarity is computed by codegen'd
  * higher-order functions (`zip_with` + `aggregate` — a fused dot product,
  * no UDF), and per-query top-k is a bounded window. With LSH, the corpus
  * is exploded into (bucket, id) rows and the join keys on bucket, so each
  * query probes only its own buckets — the cross product never happens.
  */
object Similarity {

  /** Dot product of two double-array columns (sequential fold, so results
    * are reproducible bit-for-bit across engines). Native single-loop
    * expression ([[graft.functions.VectorFunctions]]). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  /** The HOF twin of [[dot]], kept for differential testing. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Cosine from a precomputed per-side norm product — same arithmetic as
    * [[cosine]] (`sqrt(dot(x,x))` once per VECTOR instead of once per
    * pair), which cuts the pair loop from three dot products to one. The
    * norm columns are what FAISS-style indexes store alongside vectors. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = na * nb
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Brute-force cosine top-k: every query against every corpus row, ranked
    * per query. Correctness baseline — O(|Q|·|C|) with |Q| broadcast. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus.select(
        col(corpusId).as("neighbor_id"), col(corpusVec).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component — one LCG step on
    * the (table, plane, dim) index, mapped to [-1, 1). Pure 64-bit-safe
    * integer arithmetic, reproduced exactly by the SQL oracle. */
  private[similarity] def planeComponent(table: Int, plane: Int, dim: Int): Double =
    graft.functions.VectorFunctions.lcgPlaneComponent(table, plane, dim)

  /** Sign bits of `numPlanes` random-hyperplane projections packed into one
    * long bucket key — a single native expression node
    * ([[graft.functions.LshBucketExpr]]). Cosine-similar vectors collide
    * with high probability. `dim` is the (static) embedding width. */
  def lshBucket(vec: Column, numPlanes: Int, table: Int, dim: Int): Column =
    graft.functions.VectorFunctions.lshBucket(vec, numPlanes, table, dim)

  /** LSH-bucketed ANN: multi-probe via `tables` independent bucket keys;
    * candidates are corpus rows sharing any bucket with the query, then
    * exact-rescored and top-k'd. Recall < 1 by construction; the bucket
    * join replaces the cross product. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, numPlanes: Int = 12, tables: Int = 4): DataFrame = {
    // embedding width read once from the corpus head — the hyperplane
    // literals need a static dimension
    val dim = corpus.select(size(col(corpusVec))).head().getInt(0)
    def bucketed(df: DataFrame, id: String, vec: String, idOut: String,
        vecOut: String, nOut: String) = {
      val v = col(vec).cast("array<double>")
      val keys = array((0 until tables).map(t =>
        struct(lit(t).as("t"), lshBucket(v, numPlanes, t, dim).as("b"))): _*)
      df.select(col(id).as(idOut), v.as(vecOut), norm(v).as(nOut),
        explode(keys).as("bucket"))
    }
    val c = bucketed(corpus, corpusId, corpusVec, "neighbor_id", "cv", "cn")
    val q = broadcast(bucketed(queries, queryId, queryVec, "query_id", "qv", "qn"))
    val cand = c.join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(first(col("sim")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
