package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel behind [[graft.ops.TextOps.gopherRepetition]] — the full
  * Gopher repetition-statistics family (Rae et al. 2021, Appendix A.1):
  * duplicate line/paragraph fractions, duplicate line/paragraph CHARACTER
  * fractions, top n-gram character fractions (n = 2..4) and duplicated
  * n-gram character fractions (n = 5..10).
  *
  * Every metric is a pure per-document function, so the whole family is a
  * narrow projection — no explode, no groupBy, nothing shuffles. The HOF
  * formulation would be O(m²) interpreted comparisons per document per n
  * (each position counting its gram's multiplicity across the array); this
  * kernel is one O(n·m) pass per n with an open hash map, called from
  * whole-stage-codegen'd code.
  *
  * Exact definitions over an items array (tokens for n ≥ 2, trimmed
  * non-empty lines/paragraphs for n = 1) — `len()` below counts CODEPOINTS
  * (DuckDB `length()` units):
  *
  *  - `windows`  = max(0, |items| − n + 1); gram j = items[j..j+n−1]
  *    joined with a single space; `gramChars(g)` = Σ len(token) over the
  *    gram's tokens (separators NOT counted: for tokens produced by a
  *    whitespace split this equals len(joined) − (n−1); for n = 1 it is
  *    the line/paragraph length itself).
  *  - `distinct` = number of distinct grams.
  *  - `rep_chars` = Σ over grams (count−1)·gramChars — characters in
  *    occurrences AFTER the first (the duplicate line/paragraph character
  *    numerator, the datatrove `find_duplicates` convention).
  *  - `cov_chars` = Σ len(items[i]) over positions i covered by at least
  *    one window j with count(gram_j) > 1, j ≤ i ≤ j+n−1 — characters
  *    inside ANY duplicated n-gram, overlaps counted once, FIRST
  *    occurrences included (the dup-n-gram numerator for n = 5..10).
  *  - `top_chars` = max over REPEATED grams (count ≥ 2) of
  *    count·gramChars (0 when no gram repeats) — the top-n-gram numerator
  *    for n = 2..4; taking the max of the product needs no tie-break, and
  *    requiring a repeat keeps a count-1 gram in a short unique document
  *    from claiming a large fraction (the datatrove/NeMo convention).
  *    Overlapping occurrences double-count characters, so the fraction
  *    can exceed 1 on heavily-looped text — faithful to the reference
  *    implementations, which divide the same product by document length.
  *  - `tot_chars` = Σ len(items[i]) over ALL positions (computed even when
  *    windows = 0, so callers can always form fractions).
  *
  * Null elements count as "" (length 0); the corpus never produces them
  * (token/line arrays are filtered non-empty upstream). Gram identity is
  * the joined STRING, so the kernel is exact — no hash-collision caveat —
  * and a DuckDB oracle replays it with `array_to_string` verbatim.
  * Precondition for n ≥ 2: items must not contain spaces (true for any
  * whitespace-split token array), or distinct joined strings could
  * collide.
  */
object RepetitionKernel {

  def compute(a: ArrayData, n: Int): InternalRow = {
    val len = a.numElements()
    // Decode once: strings + codepoint lengths per item.
    val strs = new Array[String](len)
    val lens = new Array[Int](len)
    var tot = 0L
    var i = 0
    while (i < len) {
      val s = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      strs(i) = s
      val cp = s.codePointCount(0, s.length)
      lens(i) = cp
      tot += cp
      i += 1
    }
    if (len < n)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, tot))
    val windows = len - n + 1
    // Pass 1: count multiplicities per gram; remember each window's key.
    val counts = new java.util.HashMap[String, Array[Long]]()
    val keys = new Array[String](windows)
    var j = 0
    while (j < windows) {
      val key =
        if (n == 1) strs(j)
        else {
          val sb = new java.lang.StringBuilder()
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(strs(j + k))
            k += 1
          }
          sb.toString
        }
      keys(j) = key
      var gramChars = 0L
      var k = 0
      while (k < n) { gramChars += lens(j + k); k += 1 }
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1L, gramChars))
      else slot(0) += 1L
      j += 1
    }
    // Map fold: rep (post-first occurrences) and top (max count·chars).
    var rep = 0L
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val slot = it.next()
      rep += (slot(0) - 1L) * slot(1)
      if (slot(0) > 1L) { // only REPEATED grams score: a count-1 gram in a
        val prod = slot(0) * slot(1) // short doc would otherwise claim >20%
        if (prod > top) top = prod   // of chars and flag a fully-unique text
      }
    }
    // Pass 2: coverage — positions under any duplicated window.
    val covered = new Array[Boolean](len)
    j = 0
    while (j < windows) {
      if (counts.get(keys(j))(0) > 1L) {
        var k = 0
        while (k < n) { covered(j + k) = true; k += 1 }
      }
      j += 1
    }
    var cov = 0L
    i = 0
    while (i < len) { if (covered(i)) cov += lens(i); i += 1 }
    new GenericInternalRow(
      Array[Any](windows.toLong, counts.size.toLong, rep, cov, top, tot))
  }
}

/** graft_rep_stats(items: array<string>, n) →
  * struct(windows, distinct, rep_chars, cov_chars, top_chars, tot_chars)
  * — see [[RepetitionKernel]] for the exact definitions. NULL array → NULL.
  */
case class GopherRepStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("windows", LongType, nullable = false),
    StructField("distinct", LongType, nullable = false),
    StructField("rep_chars", LongType, nullable = false),
    StructField("cov_chars", LongType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("tot_chars", LongType, nullable = false)))

  override def prettyName: String = "graft_rep_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionKernel.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionKernel.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionFunctions {
  /** Column API for [[GopherRepStats]] (expects array<string>). */
  def graft_rep_stats(items: Column, n: Int): Column =
    ColumnBridge.column(GopherRepStats(ColumnBridge.expression(items), n))
}
