package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** ngram_hashes(tokens: array<string>, n, distinct) → array<long>: the
  * xxhash64 (seed 42, Spark's default) of every n consecutive tokens joined
  * with a single space — byte-identical to the HOF build
  * `transform(sequence(1, size-n+1), i => xxhash64(concat_ws(" ", slice(toks,
  * i, n))))`, including concat_ws's skip-null semantics, but as ONE codegen'd
  * loop instead of an interpreted lambda tree per position (slice allocates
  * an array, concat_ws and xxhash64 evaluate boxed, per element). With
  * `distinct` the result keeps first occurrences in order, matching
  * `array_distinct`. Fewer than n tokens → EMPTY array (not null): a short
  * document has no n-grams, mirroring the `when(size >= n)` guard every HOF
  * call site used.
  *
  * Serves every n-gram consumer on the hot path: shingle sets
  * (DedupOps.hashedShingles), trigram repetition and bigram shares
  * (TextOps.repetitionStats), each of which previously interpreted its
  * lambda per position.
  */
case class NGramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val space = UTF8String.fromString(" ")
    val out = new Array[Long](len - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(space, parts: _*)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    if (!distinct) UnsafeArrayData.fromPrimitiveArray(out)
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      val buf = new Array[Long](out.length)
      var k = 0
      var m = 0
      while (m < out.length) {
        if (seen.add(out(m))) { buf(k) = out(m); k += 1 }
        m += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val space = ctx.freshName("space")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seen = ctx.freshName("seen")
      val buf = ctx.freshName("buf")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val xxh = classOf[XXH64].getName
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      val dedup = if (!distinct) s"${ev.value} = $uad.fromPrimitiveArray($out);"
      else s"""
         |java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
         |long[] $buf = new long[$out.length];
         |int $k = 0;
         |for (int $m = 0; $m < $out.length; $m++) {
         |  if ($seen.add($out[$m])) $buf[$k++] = $out[$m];
         |}
         |${ev.value} = $uad.fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
      s"""
         |int $len = $a.numElements();
         |if ($len < $n) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  $utf8 $space = $utf8.fromString(" ");
         |  long[] $out = new long[$len - $n + 1];
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |    }
         |    $utf8 $s = $utf8.concatWs($space, $parts);
         |    $out[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  $dedup
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** top_count(hashes: array<long>) → long: the maximum multiplicity of any
  * value in the array (0 for empty; null elements skipped). The per-document
  * reduction behind "top n-gram share" repetition metrics: computing it
  * in-row turns the explode → groupBy(doc, gram) → groupBy(doc) shuffle
  * pyramid into a narrow projection — the value is a pure function of the
  * row, so no cross-row aggregation (and therefore no exchange) is ever
  * needed. Sort-then-scan over a primitive copy, O(d log d) per document.
  */
case class TopCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_top_count expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_count"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val vals = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { vals(m) = a.getLong(i); m += 1 }
      i += 1
    }
    if (m == 0) return 0L
    java.util.Arrays.sort(vals, 0, m)
    var best = 1L
    var run = 1L
    i = 1
    while (i < m) {
      if (vals(i) == vals(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1L
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      s"""
         |int $n = $a.numElements();
         |long[] $vals = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) $vals[$m++] = $a.getLong($i);
         |}
         |if ($m == 0) {
         |  ${ev.value} = 0L;
         |} else {
         |  java.util.Arrays.sort($vals, 0, $m);
         |  long $best = 1L; long $run = 1L;
         |  for (int $i = 1; $i < $m; $i++) {
         |    if ($vals[$i] == $vals[$i - 1]) { $run++; if ($run > $best) $best = $run; }
         |    else $run = 1L;
         |  }
         |  ${ev.value} = $best;
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

  /** Column API for [[NGramHashes]] (expects array<string>). */
  def graft_ngram_hashes(tokens: Column, n: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(NGramHashes(ColumnBridge.expression(tokens), n, distinct))

  /** Column API for [[TopCount]] (expects array<bigint>). */
  def graft_top_count(hashes: Column): Column =
    ColumnBridge.column(TopCount(ColumnBridge.expression(hashes)))
}
