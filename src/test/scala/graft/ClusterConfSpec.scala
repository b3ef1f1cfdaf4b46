package graft

import graft.dedup.Dedup
import graft.similarity.{IvfIndex, ProductQuantizer, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-configuration smoke of the two lifecycle-pinned paths
  * (VERDICT r11 task 8): the `MinhashIndex` persist layout and the
  * `IvfIndex` hier build carry cache layouts and checkpoint chains that
  * normally only run under the session's single shuffle-partition
  * setting. These tests re-assert the plan contracts and result
  * equality under `spark.sql.shuffle.partitions` values a cluster
  * would actually use (≠ the suite's 4 and the bench's 32/128), and
  * across a MID-LIFECYCLE conf change — the cheap in-sandbox proxy for
  * "the layout was built by one job config and consumed by another".
  * shuffle.partitions is a runtime conf, so each block sets it, runs,
  * and restores in a finally. */
class ClusterConfSpec extends SparkSpec {

  private def withPartitions[A](n: Int)(f: => A): A = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  private def corpus(n: Int): DataFrame = {
    // shingle-rich deterministic docs: %7 duplicates share full text
    spark.range(n.toLong).select(col("id").as("doc_id"), concat_ws(" ",
      (0 until 12).map(i => translate(
        concat(lit("w"), pmod(hash(pmod(col("id"), lit(7)) * 31 + lit(i)),
          lit(50))), "0123456789-", "abcdefghijk")): _*).as("text"))
  }

  test("MinhashIndex persist layout: no index-side exchange under " +
      "partitions=7, and still none after a mid-lifecycle switch to 64") {
    val ref = corpus(300)
    val batch = corpus(40).select((col("doc_id") + 1000L).as("doc_id"),
      col("text"))
    def screen(idx: Dedup.MinhashIndex): Seq[(Long, Long)] =
      Dedup.minhashSearch(idx, batch, "doc_id", "text")
        .select("id_new", "id_ref").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (pinned, at7) = withPartitions(7) {
        val p = Dedup.minhashIndex(ref, "doc_id", "text",
          numHashes = 16, bands = 4).persist()
        val part = p.banded.queryExecution.executedPlan.outputPartitioning
        assert(part.toString.contains("hashpartitioning") &&
          part.toString.contains("bucket"),
          s"banded store not cached bucket-partitioned at partitions=7: $part")
        (p, screen(p))
      }
      assert(at7.nonEmpty, "screen found no duplicate pairs")
      // consume the SAME pinned layout under a different job config:
      // the cached HashPartitioning(bucket, 7) still satisfies the band
      // join's ClusteredDistribution, so EnsureRequirements must keep
      // eliding the index-side exchange (the batch side adapts to the
      // cache's partitioning instead of re-exchanging 800M index rows
      // at scale)
      val at64 = withPartitions(64) {
        val probe = pinned.banded.select(col("bucket"), col("id").as("id2"))
        val plan = probe.join(pinned.banded, Seq("bucket"))
          .queryExecution.executedPlan
        val offending = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.find(_.isInstanceOf[
              org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
              .isDefined => e
        }
        assert(offending.isEmpty,
          s"pinned store re-shuffled after conf switch to 64:\n$plan")
        screen(pinned)
      }
      assert(at64 == at7,
        s"screen results drifted across shuffle-partition configs")
      pinned.release()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("IvfIndex hier build: assignment, centroid count and full-probe " +
      "search are partition-config invariant (7 vs 64)") {
    import spark.implicits._
    def h(a: Long, b: Long): Double = {
      var s = a * 6364136223846793005L + b * 1442695040888963407L + 99L
      s ^= (s >>> 33); s *= 0xff51afd7ed558ccdL; s ^= (s >>> 33)
      ((s >>> 11) % 100000L).toDouble / 50000.0 - 1.0
    }
    val vecs = (0L until 1000L).map { id =>
      val t = id % 20
      (id, Array.tabulate(8)(d => h(t, d) + 0.05 * h(id, d + 100)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    def run(parts: Int): (Int, Seq[(Long, Long)], Seq[(Long, Int)]) =
      withPartitions(parts) {
        val idx = IvfIndex.build(vecs, "vec_id", "embedding", nlist = 20,
          hierThreshold = 0, knownCount = Some(1000L))
        val cells = idx.assigned.select("id", "cell").collect()
          .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
        val full = IvfIndex.search(idx, queries, "vec_id", "embedding",
          k = 5, nprobe = idx.centroids.length)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        (idx.centroids.length, full, cells)
      }
    val (n7, full7, cells7) = run(7)
    val (n64, full64, cells64) = run(64)
    // k1=5(ish)·k2 — the documented nlist→k1·k2 round-up, config-free
    assert(n7 == n64, s"centroid count varies with partitions: $n7 vs $n64")
    assert(n7 >= 20, s"hier tier must cover nlist=20 cells, got $n7")
    assert(cells7 == cells64, "hier cell assignment varies with partitions")
    assert(full7 == full64, "full-probe search varies with partitions")
    // full probe == brute force regardless of config
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(full7 == exact, "full-probe hier search != brute force")
  }

  test("hier training sample: seed varies it, default stays the legacy " +
      "unseeded draw (ADVICE r11 — seed was silently ignored)") {
    import spark.implicits._
    val vecs = (0L until 4000L).map { id =>
      (id, Array.tabulate(4)(d => ((id * 37 + d * 11) % 100).toDouble))
    }.toDF("vec_id", "embedding")
    def ids(seed: Long): Seq[Double] =
      ProductQuantizer.sampleVectors(vecs, "vec_id", "embedding",
        sampleN = 64, knownCount = Some(4000L), seed = seed)
        .map(_.head).toSeq
    val legacy = ProductQuantizer.sampleVectors(vecs, "vec_id", "embedding",
      sampleN = 64, knownCount = Some(4000L)).map(_.head).toSeq
    assert(ids(0L) == legacy, "seed=0 must be the legacy unseeded sample")
    assert(ids(7L) != legacy, "a non-zero seed must draw a different sample")
    assert(ids(7L) == ids(7L), "seeded sampling must be deterministic")
  }
}
