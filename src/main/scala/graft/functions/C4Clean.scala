package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C4 line-level cleaning kernel (Raffel et al. 2020, §2.2 "C4"): one
  * pass over the page keeps exactly the lines that (after trimming
  * horizontal whitespace) end in terminal punctuation {. ! ? "}, carry at
  * least `minWords` whitespace-separated words, and do not mention
  * "javascript" (case-insensitive) — the paper's line rules. Returns
  * struct(clean, n_kept, n_dropped) where `clean` is the kept trimmed
  * lines re-joined with '\n'; blank lines count as dropped so
  * n_kept + n_dropped = the page's split-line count on any engine.
  *
  * A native expression rather than an `array_filter` chain for the same
  * reason the Gopher rules are regex-counts ([[graft.text.TextFunctions
  * .gopherRules]]): Spark's higher-order functions are CodegenFallback,
  * interpret their lambda per line, and poison any downstream
  * `.filter(keep)` pushdown into whole-subtree interpreted eval. The
  * kernel is plain character arithmetic, so a DuckDB `list_filter` +
  * `trim` replay reproduces it exactly (SparkEntry q111 oracle). */
object C4Clean {

  val schema: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_dropped", LongType, nullable = false)))

  /** Horizontal whitespace — '\n' is the line separator, never trimmed. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\f' || c == '\u000B'

  /** Case-insensitive ASCII search for "javascript" in s[a,b). */
  private def hasJavascript(s: String, a: Int, b: Int): Boolean = {
    val pat = "javascript"
    val m = pat.length
    var i = a
    while (i + m <= b) {
      var j = 0
      while (j < m && (s.charAt(i + j) | 0x20) == pat.charAt(j)) j += 1
      if (j == m) return true
      i += 1
    }
    false
  }

  def c4CleanRow(t: UTF8String, minWords: Int): InternalRow = {
    val s = t.toString
    val sb = new java.lang.StringBuilder(s.length)
    var kept = 0L
    var dropped = 0L
    var start = 0
    val n = s.length
    var done = false
    while (!done) {
      val nl = s.indexOf('\n', start)
      val stop = if (nl < 0) n else nl
      var a = start
      var b = stop
      while (a < b && isWs(s.charAt(a))) a += 1
      while (b > a && isWs(s.charAt(b - 1))) b -= 1
      var keep = false
      if (a < b) {
        val last = s.charAt(b - 1)
        if (last == '.' || last == '!' || last == '?' || last == '"') {
          var words = 0
          var inWord = false
          var i = a
          while (i < b) {
            if (isWs(s.charAt(i))) inWord = false
            else if (!inWord) { words += 1; inWord = true }
            i += 1
          }
          keep = words >= minWords && !hasJavascript(s, a, b)
        }
      }
      if (keep) {
        if (kept > 0) sb.append('\n')
        sb.append(s, a, b)
        kept += 1
      } else dropped += 1
      if (nl < 0) done = true else start = nl + 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), kept, dropped))
  }
}

/** `c4_clean(text, minWords)` → struct(clean, n_kept, n_dropped). */
case class C4CleanExpr(child: Expression, minWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = C4Clean.schema
  override protected def nullSafeEval(input: Any): Any =
    C4Clean.c4CleanRow(input.asInstanceOf[UTF8String], minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.C4Clean.c4CleanRow($c, $minWords)")
  override protected def withNewChildInternal(newChild: Expression): C4CleanExpr =
    copy(child = newChild)
}
