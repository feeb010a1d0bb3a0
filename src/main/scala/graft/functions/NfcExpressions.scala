package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel behind
  * [[graft.ops.TextOps.unicodeNormalize]] — canonical composition
  * (e + U+0301 → é, singletons like U+2126 Ω → U+03A9), the first step
  * of every web-corpus text-normalization stage. NFC, not NFKC: the gate
  * must not rewrite compatibility characters (ligatures, full-width
  * forms) — that is a policy decision, this is a canonical-equivalence
  * one.
  *
  * Cost model for the 100 TB scan: the overwhelming majority of crawl
  * text is ASCII, and ASCII is closed under NFC — so the kernel's fast
  * path is ONE branch-free byte scan (any byte ≥ 0x80 exits) returning
  * the INPUT REFERENCE with zero allocation. Non-ASCII rows check
  * `Normalizer.isNormalized` (almost always true for already-composed
  * UTF-8, again allocation-light) before paying the compose. The JDK's
  * Normalizer implements UAX #15 exactly as DuckDB's utf8proc does, so
  * the oracle's `nfc_normalize` replays bit-for-bit.
  */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val nb = s.numBytes()
    var i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0x80) != 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** graft_nfc(text) → text in Unicode Normalization Form C. NULL → NULL. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcKernel.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcFunctions {
  /** Column API for [[NfcNormalize]] (expects string). */
  def graft_nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
