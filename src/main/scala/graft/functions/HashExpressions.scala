package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native dedup-signature kernels as Catalyst expressions.
  *
  * The HOF formulations (`aggregate`/`transform` folds) evaluate a lambda
  * expression tree per array element: a 64-bit SimHash costs 64 vote folds ×
  * |tokens| interpreted steps, and a 64-permutation MinHash signature costs
  * 64 × |shingles| interpreted `xxhash64` applications. Both collapse to one
  * codegen'd tight loop here — same "custom Expression where built-ins are
  * the bottleneck" path as [[DotProduct]].
  *
  * Mixing uses Spark's own XXH64 (`XXH64.hashLong(h, seed)`), so results are
  * deterministic across the cluster and versions, with no string allocation
  * in the inner loop.
  */

/** simhash64(hashes: array<long>) → long: bit b of the result is set iff
  * strictly more than half of the (non-null) input hashes have bit b set —
  * i.e. the ±1 votes on bit b sum positive, identical to the reference HOF
  * fold `DedupOps.simhashFromHashes`. Empty input → 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val ones = new Array[Int](64)
    var valid = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        valid += 1
        val h = a.getLong(i)
        var b = 0
        while (b < 64) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (2 * ones(b) > valid) r |= (1L << b); b += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val ones = ctx.freshName("ones")
      val valid = ctx.freshName("valid")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $ones = new int[64];
         |int $valid = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $valid++;
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) $ones[$b] += (int) (($h >>> $b) & 1L);
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) if (2 * $ones[$b] > $valid) $r |= (1L << $b);
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sig(hashes: array<long>, k) → array<long> of length k: element p
  * is `min over h of XXH64.hashLong(h, p)` — k independent permutations of
  * the base shingle hashes, one pass over the input. Null elements are
  * skipped; an EMPTY input yields NULL (a no-shingle document has no
  * signature — filter such documents before signing).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var p = 0
        while (p < numHashes) {
          val m = XXH64.hashLong(h, p.toLong)
          if (m < sig(p)) sig(p) = m
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) continue;
         |    long $h = $a.getLong($i);
         |    for (int $p = 0; $p < $numHashes; $p++) {
         |      long $m = $xxh.hashLong($h, (long) $p);
         |      if ($m < $sig[$p]) $sig[$p] = $m;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Column API for [[SimHash64]] (expects array<bigint>). */
  def graft_simhash(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  /** Column API for [[MinHashSignature]] (expects array<bigint>). */
  def graft_minhash_sig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), numHashes))
}
