package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dsir
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming DSIR gate: scan-side scoring of a live stream against a
  * static weight table must reproduce the batch scorer on in-corpus
  * documents, apply the OOV weight to unseen vocabulary, and emit
  * keep = false for featureless rows. */
class StreamingDsirSpec extends SparkSpec {

  private val base = 1704067200000L
  private val B = 4096

  test("stream scores == batch Dsir.score on in-corpus docs; OOV + empty handled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val raw = Seq((1L, "x x y"), (2L, "y z"), (3L, "z q y x"))
      .toDF("doc_id", "text")
    val w = Dsir.bucketWeightsWhere(raw, col("doc_id") <= 1, "text", B)
    val batch = Dsir.score(raw, "doc_id", "text", w, B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingOps.streamingDsirScore(
      mem.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "ts", "text", w, B, keepAbove = 0.0)
    val query = out.writeStream.format("memory")
      .queryName("dsir_stream").outputMode("append").start()
    mem.addData(
      (1L, new Timestamp(base), "x x y"),          // in-corpus
      (3L, new Timestamp(base + 1), "z q y x"),    // in-corpus
      (9L, new Timestamp(base + 2), "zzz_unseen"), // OOV vocabulary
      (10L, new Timestamp(base + 3), ""))          // featureless
    query.processAllAvailable()
    val got = spark.sql("select * from dsir_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    query.stop()

    // in-corpus rows: identical feature multiset to batch; summation
    // order differs (scan-side fold vs grouped cnt·logw), so 1e-9 tol
    for (id <- Seq(1L, 3L)) {
      assert(got(id)._1 == batch(id)._1, s"doc $id n_feats")
      assert(math.abs(got(id)._2 - batch(id)._2) < 1e-9, s"doc $id score")
    }
    // unseen vocabulary: every feature takes the OOV weight (bucket -1)
    val oov = w.filter(col("bucket") === -1L).head().getDouble(1)
    assert(math.abs(got(9L)._2 - 1 * oov) < 1e-12, "single unseen unigram, no bigram")
    // featureless row emits and is dropped
    assert(got(10L)._1 == 0L && !got(10L)._3)
    // keep thresholding: batch doc 1 is target-like (score > 0) → kept
    assert(got(1L)._3 == (got(1L)._2 >= 0.0))
  }

  test("gopherRules is stateless column arithmetic: runs on a stream as-is") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the rule table is a pure per-row select — applying it to a
    // readStream needs no state, watermark, or adaptation; batch ≡ stream
    val text = ((1 to 60).map(i => s"word$i") ++ Seq("the", "of", "and")).mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val out = graft.text.TextFunctions.gopherRules(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val query = out.writeStream.format("memory")
      .queryName("gopher_stream").outputMode("append").start()
    mem.addData((1L, text), (2L, "too short"))
    query.processAllAvailable()
    val got = spark.sql("select doc_id, keep from gopher_stream").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    query.stop()
    val batch = graft.text.TextFunctions.gopherRules(
      Seq((1L, text), (2L, "too short")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    assert(got == batch && got(1L) && !got(2L))
  }

  test("c4Rules is stateless column arithmetic: runs on a stream as-is") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the C4 kernel + verdicts are a pure per-row select (two collapsed
    // projections) — batch ≡ stream with no state or watermark
    val good = "a one two.\nb one two.\nc one two.\nd one two.\ne one two."
    val rows = Seq((1L, good), (2L, "lorem ipsum\n" + good), (3L, "nope"))
    val mem = MemoryStream[(Long, String)]
    val out = graft.text.TextFunctions.c4Rules(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val query = out.writeStream.format("memory")
      .queryName("c4_stream").outputMode("append").start()
    mem.addData(rows: _*)
    query.processAllAvailable()
    val got = spark.sql("select doc_id, text_clean, keep from c4_stream")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    query.stop()
    val batch = graft.text.TextFunctions.c4Rules(
      rows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "text_clean", "keep")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got == batch && got(1L)._2 && !got(2L)._2 && !got(3L)._2)
  }

  test("BPE encode is stateless under a trained model: runs on a stream as-is") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train is batch (it aggregates the corpus); ENCODE under the frozen
    // model is a pure per-row expression → batch ≡ stream
    val model = graft.text.Bpe.Model(Seq(("z", "z"), ("zz", "q")))
    val rows = Seq((1L, "zz zzq"), (2L, "zzz mn"))
    val mem = MemoryStream[(Long, String)]
    val out = mem.toDF().toDF("doc_id", "text").select(col("doc_id"),
      graft.text.Bpe.tokenCount(col("text"), model).as("n"))
    val query = out.writeStream.format("memory")
      .queryName("bpe_stream").outputMode("append").start()
    mem.addData(rows: _*)
    query.processAllAvailable()
    val got = spark.sql("select doc_id, n from bpe_stream").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    query.stop()
    assert(got == Map(1L -> 2, 2L -> 4)) // [zz][zzq] ; [zz,z][m,n]
  }

  test("qualityFilter is stateless column arithmetic: runs on a stream as-is") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two projections, still a pure per-row select (the r9 codegen
    // restructure introduced no window/state) — batch ≡ stream
    val good = (1 to 30).map(i => s"goodword$i").mkString(" ")
    val rows = Seq((1L, good), (2L, "x x x x"), (3L, "a a a a a a a a a a a a"))
    val mem = MemoryStream[(Long, String)]
    val out = graft.text.TextFunctions.qualityFilter(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val query = out.writeStream.format("memory")
      .queryName("quality_stream").outputMode("append").start()
    mem.addData(rows: _*)
    query.processAllAvailable()
    val got = spark.sql("select doc_id, keep, reasons from quality_stream")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    query.stop()
    val batch = graft.text.TextFunctions.qualityFilter(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("keep")), r.getString(r.fieldIndex("reasons")))).toMap
    assert(got == batch && got(1L)._1 && !got(2L)._1 && !got(3L)._1)
  }
}
