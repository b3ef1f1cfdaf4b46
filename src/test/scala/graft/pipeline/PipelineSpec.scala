package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-data layout operators: sequence packing and deterministic
  * splitting/sampling. */
class PipelineSpec extends SparkSpec {

  private def tokDocs(sizes: Seq[Long]) = {
    import spark.implicits._
    sizes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "tok").repartition(3)
  }

  test("packSequences (range-partitioned) ≡ packSequencesWindow (declarative)") {
    // giant doc (straddles many), exact-budget doc, singletons, zeros
    val sizes = Seq[Long](5, 0, 300, 64, 1, 0, 64, 63, 129, 1, 2, 640, 7)
    val df = tokDocs(sizes)
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).sorted.toSeq
    val a = canon(Packing.packSequences(df, "doc_id", "tok", 64))
    val b = canon(Packing.packSequencesWindow(df, "doc_id", "tok", 64))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("packing invariants: full sequences, exact doc coverage, contiguity") {
    val sizes = (1 to 200).map(i => (i * 7919L) % 130) // pseudo-random 0..129
    val df = tokDocs(sizes)
    val packed = Packing.packSequences(df, "doc_id", "tok", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    val total = sizes.sum
    // every sequence holds exactly `budget` tokens except the last
    val bySeq = packed.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, n) =>
      if (s < lastSeq) assert(n == 100, s"seq $s holds $n")
      else assert(n == total - 100 * lastSeq)
    }
    // every non-empty doc's tokens are fully covered, in order
    val byDoc = packed.groupBy(_._1)
    sizes.zipWithIndex.filter(_._1 > 0).foreach { case (t, i) =>
      val spans = byDoc(i.toLong).sortBy(_._3)
      assert(spans.map(_._5).sum == t, s"doc $i covers ${spans.map(_._5).sum}/$t")
      assert(spans.head._3 == 0)
      spans.sliding(2).foreach {
        case Array(p, n) => assert(p._3 + p._5 == n._3, s"doc $i gap at $n")
        case _ =>
      }
    }
    // zero-token docs emit nothing
    assert(sizes.zipWithIndex.filter(_._1 == 0)
      .forall { case (_, i) => !byDoc.contains(i.toLong) })
    // within a sequence, spans tile [0, budget) without overlap
    packed.groupBy(_._2).foreach { case (s, rows) =>
      val tiles = rows.sortBy(_._4)
      assert(tiles.head._4 == 0, s"seq $s starts at ${tiles.head._4}")
      tiles.sliding(2).foreach {
        case Array(p, n) => assert(p._4 + p._5 == n._4, s"seq $s gap at $n")
        case _ =>
      }
    }
  }

  test("packSequencesByKey ≡ independent global packs per shard") {
    import spark.implicits._
    val docs = Seq((0L, 1L, 30L), (0L, 2L, 20L), (0L, 3L, 40L), (0L, 4L, 0L),
      (1L, 1L, 10L), (1L, 2L, 100L), (2L, 9L, 64L))
      .toDF("shard", "doc_id", "tok").repartition(4)
    val keyed = Packing.packSequencesByKey(docs, "shard", "doc_id", "tok", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sorted.toSeq
    val expected = Seq(0L, 1L, 2L).flatMap { sh =>
      val one = docs.filter(col("shard") === sh).drop("shard")
      Packing.packSequencesWindow(one, "doc_id", "tok", 64)
        .collect().map(r => (sh, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
    }.sorted
    assert(keyed == expected, s"\n$keyed\nvs\n$expected")
  }

  test("mixWeights: shares sum to 1, uniform weight inverts the share") {
    import spark.implicits._
    val df = Seq(("web", 100L), ("web", 300L), ("books", 400L),
      ("code", 100L), ("code", 100L)).toDF("source", "tok")
    val m = Sampling.mixWeights(df, "source", "tok")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m("web")._1 == 2L && m("web")._2 == 400L && m("web")._3 == 0.4)
    assert(math.abs(m("web")._4 - 1.0 / (3 * 0.4)) < 1e-12)
    assert(m("books")._3 == 0.4 && m("code")._3 == 0.2)
    assert(math.abs(m.values.map(_._3).sum - 1.0) < 1e-12)
    // equal-share source → weight exactly 1 at k sources
    assert(math.abs(m("code")._4 - 1.0 / (3 * 0.2)) < 1e-12)
  }

  test("deterministicSplit: total, stable, proportions near the weights") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("doc_id")
    val s1 = Sampling.deterministicSplit(df, "doc_id",
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
    val counts = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 2000 * 204.0 / 256) < 100, counts.toString)
    assert(counts("val") > 50 && counts("test") > 50, counts.toString)
    // same assignment on re-run and under different partitioning
    val s2 = Sampling.deterministicSplit(df.repartition(7), "doc_id",
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
    assert(s1.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      s2.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
  }

  test("stratifiedSample: exact per-stratum ceil(f·n), deterministic subset") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(df, "doc_id", Seq("lang"), 0.2)
    val perStratum = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map("lang0" -> 334, "lang1" -> 333, "lang2" -> 333)
      .map { case (k, n) => k -> math.ceil(n * 0.2).toLong }
    assert(perStratum == expected, s"$perStratum vs $expected")
    // deterministic: identical selection on re-run
    val again = Sampling.stratifiedSample(df.repartition(5), "doc_id",
      Seq("lang"), 0.2)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureSample: rates match p^(α−1)/max, smallest group keeps all") {
    import spark.implicits._
    // 3 groups, shares 0.7 / 0.2 / 0.1: α=0.5 rates = sqrt(0.1/p)
    val df = (0L until 1000L).map { i =>
      val g = if (i < 700) "big" else if (i < 900) "mid" else "small"
      (i, g)
    }.toDF("doc_id", "lang")
    val kept = Sampling.temperatureSample(df, "doc_id", "lang", alpha = 0.5)
    val rates = kept.select("lang", "sample_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def want(p: Double) = math.sqrt(0.1) / math.sqrt(p)
    assert(math.abs(rates("big") - want(0.7)) < 1e-12, rates.toString)
    assert(math.abs(rates("mid") - want(0.2)) < 1e-12, rates.toString)
    assert(rates("small") == 1.0, rates.toString)
    val per = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per("small") == 100L, "rate-1 group survives whole")
    // realized counts concentrate near n·r (md5 is uniform; 5σ slack)
    def near(n: Long, r: Double, got: Long) = {
      val sd = math.sqrt(n * r * (1 - r))
      math.abs(got - n * r) <= 5 * sd + 1
    }
    assert(near(700, want(0.7), per("big")), per.toString)
    assert(near(200, want(0.2), per("mid")), per.toString)
    // deterministic and layout-invariant
    val again = Sampling.temperatureSample(
      df.repartition(7), "doc_id", "lang", alpha = 0.5)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // α = 1 is the identity mix: every row survives at rate 1
    val all = Sampling.temperatureSample(df, "doc_id", "lang", alpha = 1.0)
    assert(all.count() == 1000L)
    assert(all.select("sample_rate").distinct().collect()
      .map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("splitByCluster: cluster members co-split, singletons ≡ per-id split") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters {0,1,2}→0, {10,250}→10; everything else singleton
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (250L, 10L))
      .toDF("id", "component")
    val got = Sampling.splitByCluster(docs, "doc_id", clusters,
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
    val bySplit = got.select("doc_id", "split", "split_key").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(bySplit.size == 300, "total: every doc assigned exactly once")
    // all members of a cluster share the representative's assignment
    assert(Set(0L, 1L, 2L).map(bySplit(_)).size == 1)
    assert(Set(10L, 250L).map(bySplit(_)).size == 1)
    assert(bySplit(1L)._2 == "0" && bySplit(250L)._2 == "10")
    // a singleton's split is exactly the per-id deterministic split
    val solo = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ((0L until 300L).toSet -- Set(0L, 1L, 2L, 10L, 250L)).foreach { i =>
      assert(bySplit(i)._1 == solo(i) && bySplit(i)._2 == i.toString)
    }
    // append-stability: adding docs never moves an existing assignment
    val more = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val again = Sampling.splitByCluster(more, "doc_id", clusters,
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    bySplit.foreach { case (i, (s, _)) => assert(again(i) == s) }
  }

  test("splitByCluster: non-numeric string ids hash properly (no null-key sink)") {
    import spark.implicits._
    // a long-cast key would null every id here, md5(null) = null, and the
    // carve's when-chain would dump ALL docs into the last split ("test")
    val docs = (0 until 300).map(i => (s"url-$i", s"doc $i"))
      .toDF("doc_id", "text")
    val clusters = Seq(("url-0", "url-0"), ("url-1", "url-0"))
      .toDF("id", "component")
    val got = Sampling.splitByCluster(docs, "doc_id", clusters,
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
      .select("doc_id", "split", "split_key").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // distribution roughly matches the 204/26/26 carve — in particular
    // NOT everything in the last split
    val counts = got.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts.getOrElse("train", 0) > 150, counts.toString)
    assert(counts.getOrElse("test", 0) < 100, counts.toString)
    // clustered docs co-split on the representative; singletons on own id
    assert(got("url-0") == got("url-1"))
    assert(got("url-1")._2 == "url-0" && got("url-7")._2 == "url-7")
    // singleton assignment ≡ the per-id deterministic split
    val solo = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
      .select("doc_id", "split").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (2 until 300).foreach(i => assert(got(s"url-$i")._1 == solo(s"url-$i")))
  }

  test("selectByBudget: best-first cut, crossing doc kept, tail skipped") {
    import spark.implicits._
    // score = 1000 - id (so rank order is id order); tok = 10 each
    val docs = (0L until 500L).map(i => (i, 1000L - i, 10L, s"p$i"))
      .toDF("doc_id", "score", "tok", "payload").repartition(9)
    val got = Sampling.selectByBudget(docs, "doc_id", "tok", "score", 105L)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
      .sortBy(_._2)
    // 10 full docs fill 100 < 105; doc 10 crosses (cum_before 100 < 105)
    assert(got.map(_._1).toSeq == (0L to 10L))
    assert(got.map(_._3).toSeq == (0L to 10L).map(_ * 10))
    // exact-budget boundary: cum_before == budget drops
    assert(Sampling.selectByBudget(docs, "doc_id", "tok", "score", 100L)
      .count() == 10L)
    assert(Sampling.selectByBudget(docs, "doc_id", "tok", "score", 0L)
      .count() == 0L)
    // payload rides along; layout-invariant
    val again = Sampling.selectByBudget(
      docs.repartition(2), "doc_id", "tok", "score", 105L)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .sortBy(_._3)
    assert(again.map(_._1).toSeq == (0L to 10L))
    again.foreach { case (id, p, _) => assert(p == s"p$id") }
    // variable sizes: the cut respects the score order, not doc size
    val varDocs = Seq((1L, 5L, 100L), (2L, 4L, 1L), (3L, 3L, 50L),
      (4L, 2L, 1L)).toDF("doc_id", "score", "tok")
    val cut = Sampling.selectByBudget(varDocs, "doc_id", "tok", "score", 101L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._2)
    // doc1 (cum 0<101), doc2 (100<101), doc3 (101 — dropped), doc4 too
    assert(cut.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("shuffleShards: balanced ±1, a permutation, layout-invariant") {
    import spark.implicits._
    val docs = (0L until 1003L).map(i => (i, s"payload $i"))
      .toDF("doc_id", "text").repartition(7)
    val got = Sampling.shuffleShards(docs, "doc_id", numShards = 16)
      .select("doc_id", "shard", "pos", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 1003)
    // payload columns ride along untouched
    got.foreach { case (id, _, _, t) => assert(t == s"payload $id") }
    // shard sizes within ±1 and (shard, pos) is a bijection onto ranks
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 16L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(got.map(t => (t._2, t._3)).distinct.length == 1003)
    assert(got.map(t => t._3 * 16 + t._2).sorted.toSeq == (0L until 1003L))
    // rank order is exactly md5-of-id order
    val byRank = got.sortBy(t => t._3 * 16 + t._2).map(_._1).toSeq
    val expect = (0L until 1003L).sortBy { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }.toSeq
    assert(byRank == expect)
    // deterministic under a different input layout
    val again = Sampling.shuffleShards(docs.repartition(3), "doc_id", 16)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(again == got.map(t => (t._1, t._2, t._3)).sorted.toSeq)
  }
}
