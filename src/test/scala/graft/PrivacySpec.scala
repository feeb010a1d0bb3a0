package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Privacy

/** Privacy transforms: masking totality/edge cases, pseudonym determinism
  * and join-stability, and the k-anonymity audit/suppression contract on
  * the real customer dimension.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("maskDigits: totality on short, null, digitless and exact-boundary values") {
    val rows = Seq(
      ("a", "12-345-6789"), ("b", "123"), ("c", "1234"), ("d", "12345"),
      ("e", "no digits here"), ("f", null), ("g", ""))
      .toDF("k", "v")
      .select(col("k"), Privacy.maskDigits(col("v")).as("m"))
      .as[(String, Option[String])].collect().toMap
    assert(rows("a").contains("XX-XXX-6789"))
    assert(rows("b").contains("123"))   // ≤ keepLast: unchanged
    assert(rows("c").contains("1234"))  // exactly keepLast: unchanged
    assert(rows("d").contains("X2345")) // one char masked... prefix is "1"
    assert(rows("e").contains("no digits here"))
    assert(rows("f").isEmpty)           // NULL stays NULL
    assert(rows("g").contains(""))
  }

  test("pseudonym: deterministic, salt-sensitive, join-stable across relations") {
    val a = Seq(("Customer#1", 1L), ("Customer#2", 2L)).toDF("name", "x")
      .select(col("x"), Privacy.pseudonym(col("name"), "s1").as("p"))
    val b = Seq(("Customer#2", 20L), ("Customer#1", 10L)).toDF("name", "y")
      .select(col("y"), Privacy.pseudonym(col("name"), "s1").as("p"))
    // same value + salt → same pseudonym, so the pseudonymized relations
    // still join on it (the point of pseudonymization vs suppression)
    val joined = a.join(b, "p").select(col("x"), col("y"))
      .as[(Long, Long)].collect().toSet
    assert(joined == Set((1L, 10L), (2L, 20L)))
    // a different salt produces disjoint pseudonyms
    val p1 = a.select(col("p")).as[String].collect().toSet
    val p2 = Seq(Tuple1("Customer#1")).toDF("name")
      .select(Privacy.pseudonym(col("name"), "s2").as("p")).as[String].collect().toSet
    assert(p1.intersect(p2).isEmpty)
    assert(p1.forall(_.length == 12))
  }

  test("suppressRare restores k-anonymity on every surviving class") {
    // synthetic quasi classes with sizes straddling k=3 (the sf0.001
    // customer slice is too small to guarantee both outcomes; the
    // registered q_k_anonymity/q_suppress_rare oracles exercise the real
    // dimension at the sf0.01 gate, where k=12 splits the classes)
    val rows = Seq.tabulate(5)(i => (100L + i, 7, "BIG")) ++
      Seq((200L, 7, "MID"), (201L, 7, "MID")) ++
      Seq((300L, 9, "LONE"))
    val df = rows.toDF("id", "nation", "segment")
    val quasi = Seq("nation", "segment")
    val audit = Privacy.kAnonymity(df, quasi, k = 3)
    val safe = audit.as[(Int, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(safe((7, "BIG")) == ((5L, true)))
    assert(safe((7, "MID")) == ((2L, false)))
    assert(safe((9, "LONE")) == ((1L, false)))
    val suppressed = Privacy.suppressRare(df, quasi, k = 3)
    // row count preserved; every non-residual class still meets k; every
    // row of a flagged class landed in the residual '*' class
    assert(suppressed.count() == df.count())
    val classes = suppressed
      .groupBy(col("nation_gen"), col("segment_gen")).count()
      .as[(String, String, Long)].collect()
    classes.filter(c => c._1 != "*").foreach { c =>
      assert(c._3 >= 3, s"surviving class $c below k")
    }
    assert(classes.filter(c => c._1 == "*").map(_._3).sum == 3L)
    // quasi values collapse together: a row is all-'*' or all-original
    val mixed = suppressed.filter(
      (col("nation_gen") === "*") =!= (col("segment_gen") === "*")).count()
    assert(mixed == 0)
    // and on the real dimension the transform is total and row-preserving
    val customer = Tables.customer(spark, TestSpark.sf0001)
    assert(Privacy.suppressRare(customer,
      Seq("c_nationkey", "c_mktsegment"), k = 12).count() == customer.count())
  }
}
