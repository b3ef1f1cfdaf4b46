package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (Sennrich, Haddow & Birch 2016) — a REAL trained
  * subword tokenizer beside the `subwordCountEstimate` heuristic: train
  * learns a merge list from corpus statistics, encode applies it greedily
  * per word and is the exact token count a packing/budgeting pipeline
  * needs.
  *
  * Scale shape: the corpus-scale work is ONE distributed pass — the
  * word-frequency table (explode + map-side-combined groupBy count). The
  * merge loop then runs in memory on that table, which is the standard
  * design for every production BPE trainer (the word-count table is the
  * sufficient statistic for all merge decisions; 32k sequential merges
  * each needing a global argmax would be 32k cluster barriers for no
  * gain). The table is bounded by `maxWords` distinct words (a loud
  * `require`, the driver-tier contract used throughout this library).
  * Encoding is a native expression — the rank table rides as a codegen
  * reference object ([[graft.functions.PqEncodeExpr]] pattern), so a
  * corpus-wide re-tokenization is one static kernel call per row inside
  * whole-stage codegen, with no shuffle at all.
  *
  * Determinism: merge selection is (max pair count, then lexicographically
  * smallest pair); encoding merges the lowest-rank pair present,
  * left-to-right, until none applies — so the same corpus always yields
  * the same merges and the same tokens on any cluster layout. Symbols are
  * code points of the lowercased whitespace-tokenized words (the
  * [[TextFunctions.tokensLower]] surface); no end-of-word marker, merges
  * never cross words. */
object Bpe {

  /** A trained merge list, rank 0 first. */
  final case class Model(merges: Seq[(String, String)]) {
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
        .toDF("rank", "left", "right")
    }
  }

  def fromDF(df: DataFrame): Model = Model(
    df.orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Train on a corpus: one distributed word-count pass, then the
    * in-memory merge loop over the (word, count) table. Stops early when
    * no pair reaches `minPairCount`.
    *
    * `minCount` is the web-scale knob (the Sennrich trainer's
    * `--min-frequency` on words): a 100-TB crawl's distinct-"word" table
    * exceeds any driver (the typo/unicode long tail is overwhelmingly
    * count-1), so pre-prune `c >= minCount` INSIDE the distributed pass —
    * the collected sufficient statistic then stays driver-size by
    * construction instead of by the overflow `require`. Effect on merge
    * order: a pruned word can only shrink counts of pairs it shares with
    * kept words, each by < minCount per word — pairs whose standing rests
    * on the kept corpus are unmoved whenever the aggregate pruned mass on
    * them is below the gap to the next merge candidate, and BpeSpec pins
    * exact merge equality for a disjoint-symbol tail (the realistic
    * shape: garbage tokens share no pair with real text). Default 1 =
    * no pruning, bit-identical to every pre-knob model. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, maxWords: Long = 10L * 1000 * 1000,
      minCount: Long = 1L): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    val wcAll = docs
      .select(explode(TextFunctions.tokensLower(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val wc = if (minCount > 1L) wcAll.filter(col("c") >= minCount) else wcAll
    // one corpus pass: limit(maxWords+1) bounds the collect (driver-safe)
    // AND detects overflow — getting maxWords+1 rows back means the full
    // table is larger; getting fewer means we hold the complete table
    val collected = wc.limit(
      math.min(maxWords + 1, Int.MaxValue.toLong).toInt).collect()
    require(collected.length <= maxWords,
      s"> $maxWords distinct words (at minCount=$minCount) — the merge " +
        "loop is an in-memory pass over the word table (the standard BPE " +
        "trainer design); raise minCount to pre-prune the long tail " +
        "distributed-side, or raise maxWords if the driver has the memory")
    val counts = collected.map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    Model(trainFromWordCounts(counts, numMerges, minPairCount))
  }

  /** The merge loop on an explicit (word, count) table — deterministic
    * for any input order (explicit tie-break), exposed for specs. */
  def trainFromWordCounts(wordCounts: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordCounts.map { case (w, c) =>
        val syms = mutable.ArrayBuffer[String]()
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        (syms, c)
      }.toArray
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.HashSet[Int]]()
    def sweep(i: Int, sign: Long): Unit = {
      val (syms, c) = words(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val nc = pairCount.getOrElse(p, 0L) + sign * c
        if (nc == 0L) pairCount.remove(p) else pairCount(p) = nc
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.HashSet[Int]()) += i
        j += 1
      }
    }
    words.indices.foreach(sweep(_, 1L))
    val merges = mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.length < numMerges && !done) {
      // max count, tie → lexicographically smallest (left, right)
      var best: ((String, String), Long) = null
      pairCount.foreach { e =>
        if (best == null || e._2 > best._2 ||
          (e._2 == best._2 && (e._1._1 < best._1._1 ||
            (e._1._1 == best._1._1 && e._1._2 < best._1._2)))) best = e
      }
      if (best == null || best._2 < minPairCount) done = true
      else {
        val (pa, pb) = best._1
        merges += ((pa, pb))
        // pairWords may hold stale ids (word edited since) — harmless,
        // the re-sweep is a no-op for them
        val affected = pairWords.getOrElse((pa, pb), mutable.HashSet[Int]()).toArray
        affected.foreach { i =>
          sweep(i, -1L)
          val (syms, c) = words(i)
          val ns = mutable.ArrayBuffer[String]()
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == pa && syms(j + 1) == pb) {
              ns += pa + pb; j += 2
            } else { ns += syms(j); j += 1 }
          }
          words(i) = (ns, c)
          sweep(i, 1L)
        }
        pairCount.remove((pa, pb))
        pairWords.remove((pa, pb))
      }
    }
    merges.toSeq
  }

  /** BPE tokens of `c` under `model` — `array<string>`, all words
    * concatenated in order. Native expression; count = `size(...)`. */
  def tokens(c: Column, model: Model): Column =
    Bridge.column(BpeTokensExpr(Bridge.expression(c), model.merges))

  def tokenCount(c: Column, model: Model): Column = size(tokens(c, model))

  /** rank lookup keyed "left NUL right" (symbols are non-whitespace, NUL cannot collide) (kernel-shared). */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      m.putIfAbsent(a + "\u0000" + b, Int.box(r))
    }
    m
  }

  /** [[BpeTokensExpr]] kernel: lowercase → whitespace words → per word,
    * repeatedly merge every left-to-right occurrence of the lowest-rank
    * adjacent pair until none applies. */
  def bpeTokensRow(input: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = input.toLowerCase.toString
    val raw = s.split("\\s+")
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < raw.length) {
      val w = raw(wi)
      if (w.nonEmpty) {
        var syms = new java.util.ArrayList[String]()
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms.add(new String(Character.toChars(cp)))
          i += Character.charCount(cp)
        }
        var go = true
        while (go && syms.size > 1) {
          var bestRank = Int.MaxValue
          var pa: String = null; var pb: String = null
          var j = 0
          while (j < syms.size - 1) {
            val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
            if (r != null && r < bestRank) {
              bestRank = r; pa = syms.get(j); pb = syms.get(j + 1)
            }
            j += 1
          }
          if (pa == null) go = false
          else {
            val ns = new java.util.ArrayList[String](syms.size)
            var k = 0
            while (k < syms.size) {
              if (k < syms.size - 1 && syms.get(k) == pa && syms.get(k + 1) == pb) {
                ns.add(pa + pb); k += 2
              } else { ns.add(syms.get(k)); k += 1 }
            }
            syms = ns
          }
        }
        var k = 0
        while (k < syms.size) { out.add(UTF8String.fromString(syms.get(k))); k += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_tokens(text)` under a fixed merge list; the rank table rides as
  * a codegen reference object. */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val ranks = Bpe.ranksOf(merges)
  override def dataType: org.apache.spark.sql.types.DataType =
    ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Bpe.bpeTokensRow(input.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.bpeTokensRow($c, $rRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}
