package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registered-query OUTPUT CONTRACT lint: every query in
  * [[SparkEntry.queries]] must emit ATOMIC top-level columns only — no
  * array, map or struct. The driver's correctness harness sorts result
  * cells with pandas before hashing, and pandas' sort requires hashable
  * scalars: a container cell crashes the compare (`TypeError: unhashable
  * type: numpy.ndarray`) and turns an otherwise-correct operator into a
  * correctness ERR (round 7's q_unigram_segment / q_unigram_assign, which
  * exposed the raw `pieces` array). List-shaped results pack to a scalar
  * instead (`array_join` — the qCoverageMap convention; or an ordered-id
  * md5 signature — the encodeTokens convention).
  *
  * One generated test per registered query, so a violation names its
  * query directly. Plans are BUILT (sf0.001), not executed — schema is a
  * plan-time property — though operators with planning-time scalars or
  * eager checkpoints (the tokenizer trainers, IVF fits) do run their
  * bounded fit jobs during construction, which is exactly what Verify
  * does before dumping. [[Verify.isAtomic]] is the single shared
  * definition, so the CI lint and the dump-time gate can never drift.
  */
class OutputContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: atomic output columns only (driver-harness cell contract)") {
      val df = fn(spark, TestSpark.sf0001)
      val bad = df.schema.fields.filterNot(f => Verify.isAtomic(f.dataType))
      val dupes = df.schema.fieldNames.groupBy(identity).collect {
        case (n, occ) if occ.length > 1 => n
      }
      spark.catalog.clearCache()
      assert(bad.isEmpty,
        s"$name emits non-atomic column(s) " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ") +
          " — the driver harness cannot hash container cells; pack to a scalar " +
          "(array_join / signature) and mirror the packing in the oracle")
      // duplicate names break the same pandas sort path a container cell does
      assert(dupes.isEmpty, s"$name emits duplicate column name(s): ${dupes.mkString(", ")}")
    }
  }

  test("oracle coverage: every oracle names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without a registered query: ${orphans.mkString(", ")}")
  }
}
