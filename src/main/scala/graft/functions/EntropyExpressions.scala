package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-statistics kernel behind
  * [[graft.ops.TextOps.charEntropy]].
  *
  * The HOF form (`array_sort(split(text, "")) → aggregate` run-length
  * fold) materializes a per-codepoint string array and sorts it —
  * O(L log L) per row plus an interpreted lambda step per element
  * (higher-order functions are CodegenFallback). This kernel is ONE
  * O(L) pass over the string with an open-addressing codepoint→count
  * map and no allocation proportional to the text beyond that map
  * (alphabet-sized, not length-sized). The summation
  * Σ round(c·ln c·1e6) is over LONGS, so map iteration order cannot
  * perturb the result — bit-identical to the sorted fold and to the
  * oracle's per-(doc, char) GROUP BY.
  */
object CharEntropyKernel {
  private final val HashMix = -1640531527 // 2^32 / golden ratio, Knuth

  /** (n_chars, n_unique, Σ round(c·ln c·1e6)) over the string's
    * CODEPOINTS — the same units DuckDB's substr/length count, and the
    * same elements `split(text, "")` emits (Java's regex engine does not
    * split surrogate pairs). Codepoints decode directly from the UTF-8
    * bytes on the fast path, so a valid-UTF-8 row (every string a Spark
    * scan produces) contributes no allocation beyond the alphabet-sized
    * map — no UTF-16 transcode of the document. The decode VALIDATES as
    * it goes (lead ranges, continuation bytes, the overlong/surrogate/
    * out-of-range bounds); any ill-formed sequence restarts the row on
    * [[computeViaString]], Java's replacement-decoding reference, so the
    * kernel is bit-equal to the HOF/toString contract on ARBITRARY
    * bytes, not just well-formed ones.
    */
  def compute(s: UTF8String): InternalRow = {
    var cap = 128 // power of two; grown at 50% load
    var keys = new Array[Int](cap) // codepoint + 1, 0 = empty
    var vals = new Array[Long](cap)
    var unique = 0
    var n = 0L
    var i = 0
    val nb = s.numBytes()
    while (i < nb) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        // strict well-formedness per RFC 3629; anything else → reference
        if (b0 >= 0xC2 && b0 <= 0xDF) { cp = b0 & 0x1F; len = 2 }
        else if (b0 >= 0xE0 && b0 <= 0xEF) { cp = b0 & 0x0F; len = 3 }
        else if (b0 >= 0xF0 && b0 <= 0xF4) { cp = b0 & 0x07; len = 4 }
        else return computeViaString(s) // 0x80-0xC1 stray/overlong, 0xF5+
        if (i + len > nb) return computeViaString(s) // truncated tail
        var j = 1
        while (j < len) {
          val bj = s.getByte(i + j) & 0xFF
          val lo = if (j == 1) b0 match {
            case 0xE0 => 0xA0 // exclude overlong 3-byte forms
            case 0xED => 0x80 // surrogates excluded by hi below
            case 0xF0 => 0x90 // exclude overlong 4-byte forms
            case _    => 0x80
          } else 0x80
          val hi = if (j == 1) b0 match {
            case 0xED => 0x9F // exclude UTF-16 surrogates
            case 0xF4 => 0x8F // exclude > U+10FFFF
            case _    => 0xBF
          } else 0xBF
          if (bj < lo || bj > hi) return computeViaString(s)
          cp = (cp << 6) | (bj & 0x3F)
          j += 1
        }
      }
      i += len
      n += 1L
      val k = cp + 1
      var idx = (k * HashMix) & (cap - 1)
      while (keys(idx) != 0 && keys(idx) != k) idx = (idx + 1) & (cap - 1)
      if (keys(idx) == 0) { keys(idx) = k; unique += 1 }
      vals(idx) += 1L
      if (unique * 2 > cap) {
        val oldKeys = keys
        val oldVals = vals
        cap <<= 1
        keys = new Array[Int](cap)
        vals = new Array[Long](cap)
        var j = 0
        while (j < oldKeys.length) {
          val ok = oldKeys(j)
          if (ok != 0) {
            var idx2 = (ok * HashMix) & (cap - 1)
            while (keys(idx2) != 0) idx2 = (idx2 + 1) & (cap - 1)
            keys(idx2) = ok
            vals(idx2) = oldVals(j)
          }
          j += 1
        }
      }
    }
    finish(keys, vals, cap, n, unique)
  }

  /** The ill-formed-input reference path: Java's UTF-8 replacement
    * decoding (`toString`) then per-codepoint counting — exactly what the
    * kernel replaced, and exactly what the HOF form (`split(text, "")`)
    * sees, since that too decodes via String. Reached only when
    * [[compute]]'s validator rejects a sequence.
    */
  private def computeViaString(s: UTF8String): InternalRow = {
    val str = s.toString
    val m = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      val slot = m.get(cp)
      if (slot == null) m.put(cp, Array(1L)) else slot(0) += 1L
    }
    var sumFp = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      sumFp += Math.round(c * Math.log(c) * 1e6)
    }
    new GenericInternalRow(Array[Any](n, m.size().toLong, sumFp))
  }

  private def finish(
      keys: Array[Int], vals: Array[Long], cap: Int, n: Long, unique: Int): InternalRow = {
    var sumFp = 0L
    var j = 0
    while (j < cap) {
      if (keys(j) != 0) {
        val c = vals(j).toDouble
        sumFp += Math.round(c * Math.log(c) * 1e6)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](n, unique.toLong, sumFp))
  }
}

/** graft_char_entropy(text) → struct(n_chars, n_unique, sum_fp): the
  * one-pass codepoint statistics; the entropy identity
  * H_fp = round(ln(n)·1e6) − sum_fp div n derives in plain columns.
  * NULL text → NULL (filter empty text upstream — a 0-char string
  * yields (0, 0, 0) and the identity's ln(0) is the caller's problem,
  * exactly as in the HOF form).
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("sum_fp", LongType, nullable = false)))

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropyKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharEntropyKernel.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EntropyFunctions {
  /** Column API for [[CharEntropyStats]] (expects string). */
  def graft_char_entropy(text: Column): Column =
    ColumnBridge.column(CharEntropyStats(ColumnBridge.expression(text)))
}
