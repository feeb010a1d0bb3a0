package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
  * a Rabin–Karp ROLLING hash over byte k-grams, then the rightmost minimum
  * of every w-hash window is selected. The winnowing guarantee: any shared
  * substring of length ≥ w + k − 1 between two documents yields at least one
  * shared fingerprint, and selection density is ~2/(w+1) — position-robust
  * near-dup detection at a fraction of full-shingle cost.
  *
  * The kernel is a static JVM method invoked from generated code (one call
  * per row — no per-element interpretation, no boxing on the hash loop).
  */
object WinnowKernel {
  private val Base = 257L

  /** Distinct selected fingerprint hashes, ascending. Texts shorter than k
    * bytes fingerprint to the empty array.
    */
  def winnow(s: UTF8String, k: Int, w: Int): UnsafeArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = n - k + 1
    // rolling k-gram hashes: h(i+1) = (h(i) - b(i)·Base^(k-1))·Base + b(i+k)
    // (mod 2^64 via natural long wrap-around — this is native JVM code, the
    // engine's ANSI-mode overflow rules apply to SQL expressions, not here)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hs(i) = h
      i += 1
    }
    // winnowing: rightmost min of each w-window; record on position change
    val win = math.min(w, m)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPos = -1
    var start = 0
    while (start <= m - win) {
      var minPos = start
      var p = start + 1
      while (p < start + win) {
        if (hs(p) <= hs(minPos)) minPos = p // rightmost minimum
        p += 1
      }
      if (minPos != lastPos) { selected += hs(minPos); lastPos = minPos }
      start += 1
    }
    val arr = selected.distinct.sorted.toArray
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
}

/** winnow_fingerprints(text, k, w) → array<long>: see [[WinnowKernel]]. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowKernel.winnow($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  /** Column API for [[WinnowFingerprints]]. */
  def graft_winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}
