package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: within-doc repetition statistics over
  * a token array, in one call per row.
  *
  * Returns struct<top_cnt:bigint, top_gram:string, dup_covered:int>:
  * the count and value of the most frequent `kTop`-gram (ties break
  * to the lexicographically smallest gram) and the number of token
  * positions covered by the interval union of every `kDup`-gram that
  * occurs at least twice — the Gopher repetition-filter kernels.
  *
  * Same tier as [[SimHash64]]: the sort+run-scan composition EXISTS
  * as builtin higher-order functions (TextFunctions.topNgram /
  * dupNgramCoverage keep that formulation as the cross-check), but
  * HOF lambdas evaluate interpreted and re-enter the fold closure per
  * element; this expression runs the same O(L log L) kernel as one
  * static JVM call and participates in WholeStageCodegen.
  */
case class RepetitionStats(child: Expression, kTop: Int, kDup: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top_cnt", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("dup_covered", IntegerType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionUtil.stats(input.asInstanceOf[ArrayData], kTop, kDup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.RepetitionUtil.stats($c, $kTop, $kDup);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionUtil {

  /** One row's repetition stats; see [[RepetitionStats]]. Called from
    * generated code — keep the signature stable. */
  def stats(arr: ArrayData, kTop: Int, kDup: Int): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val (cnt, gram) = topRun(grams(toks, kTop))
    val covered = dupCoverage(toks, kDup)
    new GenericInternalRow(Array[Any](
      cnt, UTF8String.fromString(gram), covered))
  }

  private def grams(toks: Array[String], k: Int): Array[String] = {
    val n = toks.length
    if (n < k) return Array.empty
    val out = new Array[String](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Code-point comparison == UTF-8 byte order. Java String ordering
    * (UTF-16 code units) disagrees for supplementary-plane chars vs
    * U+E000–U+FFFF (surrogates sort below 0xE000); the HOF cross-check
    * (array_sort on UTF8String) and the DuckDB oracle both compare
    * UTF-8 bytes, so the tiebreak must too. */
  private def cmpUtf8(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private val utf8Ordering: java.util.Comparator[String] =
    (a: String, b: String) => cmpUtf8(a, b)

  /** Longest equal-run in the SORTED gram array; strict > to replace
    * keeps the first (= smallest in UTF-8 byte order) gram on ties —
    * the same rule as the TextFunctions.topNgram fold. */
  private def topRun(gs: Array[String]): (Long, String) = {
    if (gs.isEmpty) return (0L, "")
    val sorted = gs.clone()
    java.util.Arrays.sort(sorted, utf8Ordering)
    var best = 0L; var bestGram = ""; var run = 0L; var prev: String = null
    var i = 0
    while (i < sorted.length) {
      val g = sorted(i)
      run = if (g == prev) run + 1 else 1
      if (run > best) { best = run; bestGram = g }
      prev = g
      i += 1
    }
    (best, bestGram)
  }

  /** Token positions covered by the interval union of duplicate
    * `k`-grams (every occurrence counts). */
  private def dupCoverage(toks: Array[String], k: Int): Int = {
    val gs = grams(toks, k)
    val m = gs.length
    if (m == 0) return 0
    val idx = Array.range(0, m).sortBy(gs(_))
    val covered = new Array[Boolean](toks.length)
    var s = 0
    while (s < m) {
      var e = s + 1
      while (e < m && gs(idx(e)) == gs(idx(s))) e += 1
      if (e - s >= 2) {
        var r = s
        while (r < e) {
          val p = idx(r)
          var q = p
          while (q < p + k) { covered(q) = true; q += 1 }
          r += 1
        }
      }
      s = e
    }
    var c = 0; var i = 0
    while (i < covered.length) { if (covered(i)) c += 1; i += 1 }
    c
  }
}
