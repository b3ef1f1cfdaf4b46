package graft.pipeline

import graft.SparkSpec

/** `doc/pipeline.md` as an EXECUTABLE spec — the sibling of
  * [[graft.api.DocExamplesSpec]] for the driver-mandated curation half
  * of the library (VERDICT r11 task 7): every ```scala block in the doc
  * lives here verbatim between `// doc:begin` / `// doc:end` markers and
  * is compiled + executed with assertions on its results; the final test
  * re-reads both files and fails on ANY divergence, so the published
  * dedup → quality → split → pack flow can never drift from what
  * actually runs. */
class PipelineDocExamplesSpec extends SparkSpec {

  test("doc/pipeline.md: the curation flow executes with the documented results") {
    // doc:begin corpus
    import graft.dedup.Dedup
    import graft.text.TextFunctions
    import graft.pipeline.{Packing, Sampling}
    import org.apache.spark.sql.functions._

    // 60 crawled pages: every 10th is a short spam stub; of the rest,
    // pages with id % 3 == 0 and 1 are fuzzy copies of one article
    // (they differ in a single trailing token), id % 3 == 2 pages carry
    // genuinely unique hashed-word bodies:
    val docs = spark.range(60).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit("buy now click here"))
        .when(col("id") % 3 === 2, concat_ws(" ", (0 until 25).map(i =>
          translate(concat(lit("b"), pmod(hash(col("id") * 31 + lit(i)),
            lit(100000))), "0123456789-", "aeioubcdfgh")): _*))
        .otherwise(concat(
          lit("the quick brown fox jumps over the lazy dog near the "),
          lit("river bank and carries a basket of fresh apples to the "),
          lit("market every single morning without fail variant "),
          (col("id") % 3).cast("string")))
        .as("text"))
    // doc:end
    assert(docs.count() == 60)

    // doc:begin dedup
    // Near-duplicate removal: MinHash banding proposes candidate pairs
    // (never all-pairs), connected components clusters them, and each
    // cluster keeps its minimum id as the canonical copy:
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleHashesOf = TextFunctions.shingleHashes(_, 3),
        numHashes = 64, bands = 8)
      .filter(col("est_jaccard") >= 0.5)
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("component"))
    val canonical = docs.join(clusters, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
    // doc:end
    // fixture arithmetic: 36 article copies collapse to one canonical,
    // 6 identical spam stubs to one, 18 unique pages survive as-is
    assert(pairs.count() > 0)
    assert(canonical.count() == 20, s"canonical = ${canonical.count()}")

    // doc:begin imagededup
    // 8 images as binary PPM payloads: ids 0-3 are byte-identical
    // re-encodes of one frame, ids 4-7 carry unique pixel patterns.
    // dHash pairs them (Hamming <= 2), components cluster, min id keeps:
    import graft.multimodal.Multimodal
    import spark.implicits._
    val images = spark.range(8).select(col("id")).as[Long].mapPartitions(_.map { id =>
      val w = 16; val h = 12
      val seed = if (id < 4) 7L else id * 13 + 7
      val pix = Array.tabulate[Byte](w * h * 3)(k =>
        ((seed + 11L * k + (seed % 5 + 1) * k.toLong * k) % 256).toByte)
      Multimodal.MediaRow(id, Multimodal.encodePpmP6(w, h, 255, pix))
    }).toDF()
    val imgPairs = Multimodal.imageNearDupCandidates(images, "id", "payload",
      maxHamming = 2)
    val imgClusters = Dedup.connectedComponents(imgPairs)
      .select(col("id").as("img_id"), col("component"))
    val imgCanonical = images.select(col("id").as("img_id"))
      .join(imgClusters, Seq("img_id"), "left")
      .filter(col("component").isNull || col("component") === col("img_id"))
    // doc:end
    // the four re-encodes collapse to image 0; unique frames keep
    // themselves — 5 canonical images, cluster representative id 0
    assert(imgCanonical.count() == 5,
      s"imgCanonical = ${imgCanonical.count()}")
    val imgComp = imgClusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 4L).forall(i => imgComp.get(i).contains(0L)),
      s"re-encode cluster: $imgComp")

    // doc:begin quality
    // Heuristic quality verdicts: keep plus auditable reasons per doc —
    // the spam stub dies on length, real articles pass:
    val verdicts = TextFunctions.qualityFilter(canonical, "doc_id", "text")
    val kept = verdicts.filter(col("keep"))
    // doc:end
    assert(kept.count() == 19, s"kept = ${kept.count()}")
    val dropped = verdicts.filter(!col("keep"))
      .select("doc_id", "reasons").collect()
    assert(dropped.length == 1 && dropped.head.getLong(0) == 0L)
    assert(dropped.head.getString(1).contains("too_short"))

    // doc:begin split
    // Deterministic, append-stable train/val/test carve on the id hash
    // (80/10/10 via 256ths); near-dups can't straddle splits because
    // only canonicals remain (Sampling.splitByCluster is the variant
    // that enforces this for corpora deduplicated elsewhere):
    val split = Sampling.deterministicSplit(kept, "doc_id",
      Seq("train" -> 204, "val" -> 26, "test" -> 26))
    // doc:end
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == 19)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))

    // doc:begin pack
    // Sequence packing for training: fetch the surviving texts, count
    // tokens, then cut the id-ordered token stream into fixed 64-token
    // sequences — output rows are (doc_id, seq_id, doc_offset,
    // seq_offset, n_tokens) spans, ready to drive a gather of the
    // actual token ids:
    val counted = split.filter(col("split") === "train")
      .join(docs, "doc_id")
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
    val packed = Packing.packSequences(counted, "doc_id", "n_tok", budget = 64L)
    // doc:end
    val rows = packed.collect()
    assert(rows.nonEmpty)
    // spans tile each sequence without overlap or overflow
    rows.foreach { r =>
      val seqOff = r.getLong(3); val n = r.getLong(4)
      assert(n > 0 && seqOff + n <= 64L, s"bad span $r")
    }
    val totalTok = counted.agg(sum("n_tok")).head().getLong(0)
    assert(rows.map(_.getLong(4)).sum == totalTok,
      "packed spans must cover every token exactly once")
  }

  test("doc/pipeline.md code blocks are verbatim-identical to the executed regions") {
    def deindent(lines: Seq[String]): Seq[String] = {
      val body = lines.dropWhile(_.trim.isEmpty).reverse.dropWhile(_.trim.isEmpty).reverse
      val pad = body.filter(_.trim.nonEmpty)
        .map(_.takeWhile(_ == ' ').length).minOption.getOrElse(0)
      body.map(l => if (l.length >= pad) l.substring(pad) else l.trim)
    }
    val docPath = java.nio.file.Paths.get("doc/pipeline.md")
    val specPath = java.nio.file.Paths.get(
      "src/test/scala/graft/pipeline/PipelineDocExamplesSpec.scala")
    val doc = java.nio.file.Files.readString(docPath).linesIterator.toVector
    val spec = java.nio.file.Files.readString(specPath).linesIterator.toVector

    def regions(lines: Vector[String], begin: String => Boolean,
        end: String => Boolean): Vector[Seq[String]] = {
      val out = Vector.newBuilder[Seq[String]]
      var i = 0
      while (i < lines.length) {
        if (begin(lines(i))) {
          val j = lines.indexWhere(end, i + 1)
          assert(j > i, s"unterminated region at line ${i + 1}")
          out += deindent(lines.slice(i + 1, j))
          i = j + 1
        } else i += 1
      }
      out.result()
    }
    val docBlocks = regions(doc,
      l => l.trim == "```scala", l => l.trim == "```")
    val specBlocks = regions(spec,
      l => l.trim.startsWith("// doc:begin"), l => l.trim == "// doc:end")
    assert(docBlocks.nonEmpty, "doc/pipeline.md has no ```scala blocks")
    assert(docBlocks.length == specBlocks.length,
      s"doc has ${docBlocks.length} scala blocks, spec executes ${specBlocks.length}")
    docBlocks.zip(specBlocks).zipWithIndex.foreach { case ((d, s), i) =>
      assert(d == s,
        s"block ${i + 1} diverged:\n--- doc ---\n${d.mkString("\n")}\n" +
          s"--- executed ---\n${s.mkString("\n")}")
    }
  }
}
