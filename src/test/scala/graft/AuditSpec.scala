package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AuditOps

/** Constraint-audit scorecard: null-predicate conservatism, uniqueness
  * counting conventions (every row of a duplicated key), referential
  * orphans including NULL child keys, and suite union shape.
  */
class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("auditRows: one scan, many checks; NULL predicate counts as violation") {
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(-3.0)), (3L, None), (4L, Some(0.0))
    ).toDF("id", "v")
    val got = AuditOps.auditRows(df, "t", Seq(
      "v_positive" -> !(col("v") > 0),      // -3, 0 violate; NULL → violation
      "v_complete" -> col("v").isNull))     // one null
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("v_positive") == ((3L, 4L, false)))
    assert(got("v_complete") == ((1L, 4L, false)))
  }

  test("auditRows on an empty table passes trivially — never NULL") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("id", "v")
    val got = AuditOps.auditRows(empty, "t", Seq("v_positive" -> !(col("v") > 0)))
      .select("violations", "total", "pass").as[(Long, Long, Boolean)].head()
    assert(got == ((0L, 0L, true)))
  }

  test("auditUnique counts every row of a duplicated key; null keys group") {
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), // 3 rows of one dup key
      (2L, "b"), (3L, null), (4L, null)
    ).toDF("k1", "k2")
    val one = AuditOps.auditUnique(df, "t", Seq("k1", "k2"), "pk")
      .select("violations", "total", "pass").as[(Long, Long, Boolean)].head()
    assert(one == ((3L, 6L, false)))
    // distinct null keys are NOT duplicates of each other (different k1)
    val dupNull = Seq((1L, null: String), (1L, null: String)).toDF("k1", "k2")
    val two = AuditOps.auditUnique(dupNull, "t", Seq("k1", "k2"), "pk")
      .select("violations", "total", "pass").as[(Long, Long, Boolean)].head()
    assert(two == ((2L, 2L, false)), "repeated all-NULL-component keys are duplicates")
  }

  test("auditReferential: orphan rows counted per child ROW; NULL child key is an orphan") {
    val child = Seq(
      (10L, "x"), (10L, "y"), // both match
      (99L, "z"),             // orphan key, 1 row
      (null.asInstanceOf[Any], "w").asInstanceOf[(Any, String)]
    ).map { case (k, v) => (Option(k).map(_.asInstanceOf[Long]), v) }
      .toDF("fk", "payload")
    val parent = Seq((10L, "p"), (11L, "q"), (10L, "dup")).toDF("pk", "name")
    val got = AuditOps.auditReferential(
      child, "child", Seq("fk" -> "pk"), parent, "child_fk")
      .select("violations", "total", "pass").as[(Long, Long, Boolean)].head()
    assert(got == ((2L, 4L, false))) // the 99-row and the NULL-row
  }

  test("audit folds are lossless: merged batch partials reproduce the one-shot audits") {
    val df = Seq(
      (1L, Some(10.0)), (1L, Some(-3.0)), (2L, None), (3L, Some(5.0)), (3L, Some(1.0))
    ).toDF("k", "v")
    val checks = Seq("v_positive" -> !(col("v") > 0))
    def halves = Seq(df.filter(col("k") % 2 === 0), df.filter(col("k") % 2 === 1))
    // row-check fold
    val rowOne = AuditOps.auditRows(df, "t", checks)
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSet
    val rowFold = AuditOps.mergeRowAudits(halves.map(AuditOps.auditRows(_, "t", checks)): _*)
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(rowFold == rowOne)
    // uniqueness via key-count fold (key 1 and 3 are duplicated ACROSS a
    // single batch each; also split so a key's rows straddle batches)
    val splits = Seq(df.limit(2), df.offset(2))
    val uniqOne = AuditOps.auditUnique(df, "t", Seq("k"), "pk")
      .as[(String, String, Long, Long, Boolean)].head()
    val uniqFold = AuditOps.auditUniqueFromCounts(
      AuditOps.mergeKeyCounts(Seq("k"))(splits.map(AuditOps.keyCounts(_, Seq("k"))): _*),
      "t", "pk").as[(String, String, Long, Long, Boolean)].head()
    assert(uniqFold == uniqOne)
    // referential via the same fold
    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("pk")
    val riOne = AuditOps.auditReferential(df, "t", Seq("k" -> "pk"), parent, "fk")
      .as[(String, String, Long, Long, Boolean)].head()
    val riFold = AuditOps.auditReferentialFromCounts(
      AuditOps.mergeKeyCounts(Seq("k"))(splits.map(AuditOps.keyCounts(_, Seq("k"))): _*),
      "t", Seq("k" -> "pk"), parent, "fk")
      .as[(String, String, Long, Long, Boolean)].head()
    assert(riFold == riOne)
  }

  test("suite unions families into one scorecard schema") {
    val df = Seq((1L, 1L), (2L, 1L)).toDF("id", "g")
    val s = AuditOps.suite(
      AuditOps.auditRows(df, "t", Seq("id_complete" -> col("id").isNull)),
      AuditOps.auditUnique(df, "t", Seq("id"), "pk"))
      .select("check_name", "table_name", "violations", "total", "pass")
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(s == Set(
      ("id_complete", "t", 0L, 2L, true),
      ("pk", "t", 0L, 2L, true)))
  }
}
