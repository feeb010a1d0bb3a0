package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake (double-encoding) repair kernel behind
  * [[graft.ops.TextOps.fixMojibake]] — the ftfy slot of a web-corpus
  * pipeline: text that was UTF-8 encoded but DECODED as cp1252/latin-1
  * somewhere upstream ("café" shipped as "cafÃ©", "’" as "â€™") is
  * repaired by inverting the mis-decode: re-encode the characters back
  * to their cp1252 bytes and decode those bytes as UTF-8.
  *
  * The inversion is attempted only when it is PROVABLY the right move,
  * which makes the repair safe to run corpus-wide:
  *  - pure-ASCII rows exit on one byte scan (the 100 TB fast path —
  *    mojibake requires high characters by construction);
  *  - if ANY character has no cp1252 byte (CJK, emoji, already-correct
  *    non-Latin text), the row is untouched;
  *  - if the re-encoded bytes are NOT valid UTF-8 (genuine Latin-1-range
  *    text like a real "café": 0xE9 is no UTF-8 lead), the row is
  *    untouched — so correctly-encoded accented text can never be
  *    corrupted.
  * The fix is DOCUMENT-ATOMIC: one genuine accented character anywhere
  * vetoes the repair of mojibake elsewhere in the same document (unlike
  * ftfy's per-segment heuristics) — the conservative trade, documented
  * and oracle-replayed. Up to `maxRounds` inversions run for
  * double-encoded text ("ÃƒÂ©" → "Ã©" → "é"); each round re-applies the
  * same provably-safe test, so iteration terminates the moment the text
  * is either clean or ambiguous.
  *
  * The byte↔char table is cp1252 with the five undefined positions
  * (0x81 0x8D 0x8F 0x90 0x9D) mapped identity to U+0081.. (the latin-1
  * fallback real decoders exhibit — "sloppy cp1252", same choice as
  * ftfy), so every byte 0x00..0xFF has exactly one character and the
  * inverse is total on mojibake output.
  */
object MojibakeKernel {
  /** cp1252 byte → char, undefined positions latin-1 identity. */
  private val byteToChar: Array[Char] = {
    val a = new Array[Char](256)
    var b = 0
    while (b < 256) { a(b) = b.toChar; b += 1 } // latin-1 identity base
    // the 27 cp1252 C1-range overrides (Unicode codepoints per the
    // windows-1252 table; written as escapes so no editor can renormalize)
    val overrides = Seq(
      0x80 -> '\u20AC', 0x82 -> '\u201A', 0x83 -> '\u0192', 0x84 -> '\u201E',
      0x85 -> '\u2026', 0x86 -> '\u2020', 0x87 -> '\u2021', 0x88 -> '\u02C6',
      0x89 -> '\u2030', 0x8A -> '\u0160', 0x8B -> '\u2039', 0x8C -> '\u0152',
      0x8E -> '\u017D', 0x91 -> '\u2018', 0x92 -> '\u2019', 0x93 -> '\u201C',
      0x94 -> '\u201D', 0x95 -> '\u2022', 0x96 -> '\u2013', 0x97 -> '\u2014',
      0x98 -> '\u02DC', 0x99 -> '\u2122', 0x9A -> '\u0161', 0x9B -> '\u203A',
      0x9C -> '\u0153', 0x9E -> '\u017E', 0x9F -> '\u0178')
    overrides.foreach { case (b0, c) => a(b0) = c }
    a
  }

  /** char → cp1252 byte + 1, 0 = unmappable. */
  private val charToByte: Array[Short] = {
    val m = new Array[Short](0x2200) // covers U+0000..U+21FF (max is € U+20AC, ™ U+2122)
    var b = 0
    while (b < 256) {
      val c = byteToChar(b)
      if (c < 0x2200) m(c) = (b + 1).toShort
      b += 1
    }
    m
  }

  /** One inversion round: chars → cp1252 bytes → strict UTF-8 decode.
    * Returns null when the row is not provably mojibake.
    */
  private def invertOnce(str: String): String = {
    val n = str.length
    val bytes = new Array[Byte](n)
    var i = 0
    var anyHigh = false
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 0x2200) return null
      val b = charToByte(c)
      if (b == 0) return null
      if ((b - 1) >= 0x80) anyHigh = true
      bytes(i) = (b - 1).toByte
      i += 1
    }
    if (!anyHigh) return null // pure ASCII: nothing to invert
    // strict UTF-8 decode: reject on ANY malformed/unmappable sequence
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** (text_fixed, changed, n_rounds) */
  def fix(s: UTF8String, maxRounds: Int): InternalRow = {
    // ASCII fast path straight off the bytes
    val nb = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < nb) { ascii = (s.getByte(i) & 0x80) == 0; i += 1 }
    if (ascii) return new GenericInternalRow(Array[Any](s, false, 0L))
    var cur = s.toString
    var rounds = 0L
    var repaired = invertOnce(cur)
    while (repaired != null && rounds < maxRounds) {
      cur = repaired
      rounds += 1L
      repaired = if (rounds < maxRounds) invertOnce(cur) else null
    }
    if (rounds == 0L) new GenericInternalRow(Array[Any](s, false, 0L))
    else new GenericInternalRow(Array[Any](UTF8String.fromString(cur), true, rounds))
  }
}

/** graft_fix_mojibake(text, maxRounds) → struct(text_fixed, changed,
  * n_rounds). NULL text → NULL.
  */
case class FixMojibake(child: Expression, maxRounds: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fix_mojibake expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("text_fixed", StringType, nullable = false),
    StructField("changed", BooleanType, nullable = false),
    StructField("n_rounds", LongType, nullable = false)))

  override def prettyName: String = "graft_fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    MojibakeKernel.fix(input.asInstanceOf[UTF8String], maxRounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MojibakeKernel.fix($s, $maxRounds);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MojibakeFunctions {
  /** Column API for [[FixMojibake]] (expects string). */
  def graft_fix_mojibake(text: Column, maxRounds: Int = 2): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(text), maxRounds))
}
