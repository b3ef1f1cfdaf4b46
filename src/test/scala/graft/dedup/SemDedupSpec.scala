package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup semantics: the canonical lower-id ε-ball drop rule, cluster
  * locality (no cross-cluster drops), the flood cap, and the kMeans
  * production clusterer agreeing with fromRows on separated data. */
class SemDedupSpec extends SparkSpec {

  /** 2-D unit-ish vectors in two well-separated directions; ids chosen so
    * cluster 0's centroid rows are the 2 lowest ids. */
  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      // direction (1, 0) family
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 1.0)),          // direction (0, 1) — second centroid
      (2L, Array(0.9999, 0.0141)),    // near-dup of 0 (cos ≈ 0.9999)
      (3L, Array(0.97, 0.24)),        // same cluster, sim ≈ 0.97 to 0 — dropped vs 0
      (4L, Array(0.0141, 0.9999)),    // near-dup of 1
      (5L, Array(0.7, 0.72)),         // between — lands in one cluster only
      (6L, Array(-1.0, 0.0))          // far from everything: kept
    ).toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
  }

  test("lower-id ε-ball rule: near-dups drop, earliest survives, locality holds") {
    val cb = SemDedup.centroidsFromRows(corpus, "id", "v", k = 2)
    val out = SemDedup.dedup(corpus, "id", "v", cb, threshold = 0.95,
      normalized = false)
      .collect().map(r =>
        r.getLong(0) -> (r.getAs[Number](1).longValue, r.getBoolean(2))).toMap
    assert(out.size == 7)
    assert(out(0L)._2, "earliest member of its ε-group is kept")
    assert(!out(2L)._2, "near-dup of 0 dropped")
    assert(!out(3L)._2, "0.97-sim to id 0 exceeds τ=0.95 → dropped")
    assert(out(1L)._2, "earliest of the (0,1) family kept")
    assert(!out(4L)._2, "near-dup of 1 dropped")
    assert(out(6L)._2, "isolated vector kept")
    // locality: 6 is antipodal to 0 — same cluster as nothing similar;
    // its verdict must come only from members of ITS cluster
    val clusters = out.map { case (id, (c, _)) => id -> c }
    assert(clusters(0L) == clusters(2L) && clusters(0L) == clusters(3L))
  }

  test("chain a–b–c keeps exactly the members with no earlier neighbor") {
    import spark.implicits._
    // sim(a,b) ≈ sim(b,c) ≈ 0.9962 ≥ τ, sim(a,c) ≈ 0.985 < τ: the drop
    // rule is vs ANY earlier member, so b and c both drop (c via b even
    // though b itself was dropped) — the documented canonical semantics
    val chain = Seq(
      (0L, Array(1.0, 0.0)),
      (1L, Array(math.cos(0.0873), math.sin(0.0873))),   // 5° from a
      (2L, Array(math.cos(0.1745), math.sin(0.1745)))    // 10° from a
    ).toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val cb = SemDedup.centroidsFromRows(chain, "id", "v", k = 1)
    val out = SemDedup.dedup(chain, "id", "v", cb, threshold = 0.996)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(0L) && !out(1L) && !out(2L))
  }

  test("over-cap clusters skip pairwise pruning and keep every member") {
    val cb = SemDedup.centroidsFromRows(corpus, "id", "v", k = 2)
    val out = SemDedup.dedup(corpus, "id", "v", cb, threshold = 0.95,
      maxClusterSize = 2L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every cluster has >2 members → all capped → everything kept
    assert(out.values.forall(identity))
  }

  test("kMeans clusterer reproduces the fromRows verdicts on separated data") {
    val det = SemDedup.dedup(corpus, "id", "v",
      SemDedup.centroidsFromRows(corpus, "id", "v", k = 2), threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val km = SemDedup.dedup(corpus, "id", "v",
      SemDedup.centroidsKMeans(corpus, "id", "v", k = 2, sampleN = 16,
        maxIter = 5), threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // cluster IDS may differ; keep/drop verdicts must not (the two
    // clusterers separate the same two directions)
    assert(det == km)
  }
}
