package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector kernels as Catalyst expressions.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are interpreted
  * per element — every lambda application walks an expression tree — so a
  * 64-dim dot product costs ~128 boxed evaluations. This expression is the
  * "drop to a custom `Expression` where built-ins can't express it
  * efficiently" path: one codegen'd tight loop over the two `ArrayData`
  * buffers, identical accumulation order (sequential left fold) to both the
  * HOF formulation and the DuckDB oracle's `list_dot_product`, so results
  * stay bit-exact while the interpretive overhead disappears.
  *
  * Null semantics: null if either array is null (standard binary-expression
  * propagation); null ELEMENTS contribute 0 (documents with padded vectors
  * keep a defined score).
  *
  * Ragged inputs: arrays of different lengths reduce over the COMMON PREFIX
  * (pinned in SimilaritySpec). This is a deliberate total-function contract
  * — a mixed-dimension corpus degrades scores instead of killing a
  * corpus-wide search — but it means a malformed short vector yields a
  * plausible partial score, and the bit-exactness claim above holds only
  * for equal-length inputs (DuckDB's list_dot_product RAISES on mismatch);
  * validate dimensions at ingest when exact parity matters.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects (array<double>, array<double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += a.getDouble(i) * b.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer squared-L2 distance over two array<bigint> fixed-point vectors —
  * the assignment kernel of [[graft.ops.SimilarityOps.kmeansFixedPoint]].
  * Same preference-ladder rationale as [[DotProduct]]: the HOF form
  * (`aggregate(zip_with(...))`) interprets two lambdas per element; this is
  * one codegen'd long loop, exact 64-bit arithmetic identical to the HOF
  * fold and to the oracle's list comprehension. Null semantics and ragged
  * common-prefix contract as [[DotProduct]] (null elements contribute 0).
  */
case class L2SquaredFp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_l2sq expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two array<bigint> fixed-point vectors — the
  * margin kernel of [[graft.ops.ClassifierOps]] (⟨w, x⟩ at Scale²). Same
  * preference-ladder rationale, null semantics and ragged common-prefix
  * contract as [[L2SquaredFp]]; exact 64-bit wraparound arithmetic
  * identical (on NULL-FREE arrays — the HOF fold propagates a null
  * element to a NULL total where this kernel skips the position, the
  * [[L2SquaredFp]] contract) to the fold
  * `aggregate(zip_with(a,b,_*_), 0L, _+_)` it replaces and to the
  * oracle's list comprehension.
  */
case class DotFp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dotfp expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotfp"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProduct]] (expects array<double> inputs). */
  def graft_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[L2SquaredFp]] (expects array<bigint> inputs). */
  def graft_l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2SquaredFp(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[DotFp]] (expects array<bigint> inputs). */
  def graft_dotfp(a: Column, b: Column): Column =
    ColumnBridge.column(DotFp(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
