package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel behind [[graft.ops.DedupOps.cdcChunks]] — the whole
  * content-defined chunking pass (window hashes, boundary gate, sequential
  * minChunk fold, chunk reconstruction, chunk ids) in ONE O(len) walk per
  * document.
  *
  * The HOF formulation evaluated a Column tree per character position:
  * `substr` allocation + `md5` + `conv(substring(hex))` per window, all
  * interpreted (higher-order functions are CodegenFallback) — measured
  * ~7.5 s per registered CDC query at sf0.1. This kernel reuses one
  * MessageDigest and one window byte buffer; the hash value is read
  * directly from the digest bytes.
  *
  * Hash equivalence contract (spec-pinned): `md5Hash60(s)` =
  * `conv(substring(md5(s), 1, 15), 16, 10)` = the first 60 bits of the
  * MD5 digest of s's UTF-8 bytes = big-endian(first 8 digest bytes) >>> 4.
  * Windows/chunks slice by CODEPOINT offsets (DuckDB `substr` units) and
  * hash the slice's UTF-8 bytes, so non-ASCII text hashes exactly what
  * the SQL `substr`→`md5` replay hashes.
  *
  * Output: array<struct<chunk_idx, chunk_start, chunk_len, chunk_id>> —
  * 1-based codepoint offsets; empty/NULL-handled text emits an empty
  * array (callers explode, so empty docs emit no rows).
  */
object CdcKernel {

  def compute(s: UTF8String, window: Int, maskBits: Int, minChunk: Int): ArrayData = {
    val str = s.toString
    // codepoint-addressable view (the corpus is BMP/ASCII in practice, but
    // the contract is DuckDB substr units = codepoints)
    val cps = str.codePoints().toArray
    val len = cps.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1L
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash60(cpFrom: Int, cpUntil: Int): Long = {
      val sub = new String(cps, cpFrom, cpUntil - cpFrom)
      val d = md.digest(sub.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      val hi = ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      hi >>> 4
    }
    // boundary walk: candidate at 1-based position i (window end) when the
    // window hash's low maskBits bits are zero; accept if >= minChunk past
    // the previous accepted boundary
    val bounds = scala.collection.mutable.ArrayBuffer[Int](0)
    if (len >= window) {
      var i = window
      while (i <= len) {
        if ((hash60(i - window, i) & mask) == 0L && i - bounds.last >= minChunk)
          bounds += i
        i += 1
      }
    }
    if (bounds.last < len) bounds += len
    val out = new Array[Any](bounds.length - 1)
    var j = 0
    while (j < bounds.length - 1) {
      val start = bounds(j)
      val end = bounds(j + 1)
      out(j) = new GenericInternalRow(Array[Any](
        j.toLong, (start + 1).toLong, (end - start).toLong, hash60(start, end)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_cdc_chunks(text, window, maskBits, minChunk) — see [[CdcKernel]]. */
case class CdcChunks(child: Expression, window: Int, maskBits: Int, minChunk: Int)
    extends UnaryExpression {
  require(window >= 1 && maskBits >= 1 && minChunk >= 0, "invalid CDC parameters")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_start", LongType, nullable = false),
    StructField("chunk_len", LongType, nullable = false),
    StructField("chunk_id", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcKernel.compute(input.asInstanceOf[UTF8String], window, maskBits, minChunk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CdcKernel.compute($s, $window, $maskBits, $minChunk);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcFunctions {
  /** Column API for [[CdcChunks]] (expects string). */
  def graft_cdc_chunks(text: Column, window: Int, maskBits: Int, minChunk: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), window, maskBits, minChunk))
}
