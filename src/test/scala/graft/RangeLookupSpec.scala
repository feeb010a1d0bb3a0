package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Plans, RangeLookupJoinExec}

class RangeLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bnl(facts: org.apache.spark.sql.DataFrame, bands: org.apache.spark.sql.DataFrame) =
    facts.join(broadcast(bands), col("v") >= col("lo") && col("v") < col("hi"))

  test("rangeLookup equals the nested-loop join, including OVERLAPPING bands") {
    val facts = Seq(0.5, 1.0, 5.0, 9.99, 10.0, 25.0, 99.0).toDF("v")
    val bands = Seq(
      (1L, 0.0, 10.0), (2L, 5.0, 30.0), // overlap [5,10)
      (3L, 10.0, 20.0), (4L, 95.0, 100.0)
    ).toDF("band_id", "lo", "hi")
    val custom = Plans.rangeLookup(facts, bands, "v", "lo", "hi")
      .select("v", "band_id").as[(Double, Long)].collect().sorted.toSeq
    val expected = bnl(facts, bands)
      .select("v", "band_id").as[(Double, Long)].collect().sorted.toSeq
    assert(custom == expected)
    assert(custom.contains((5.0, 1L)) && custom.contains((5.0, 2L))) // overlap matched twice
    assert(expected.contains((10.0, 3L)) && !expected.contains((10.0, 1L))) // hi exclusive
  }

  test("rangeLookup survives shared lineage: bands derived from the facts frame") {
    // the realistic shape — bands computed by an aggregate OVER the facts —
    // makes the analyzer deduplicate the right relation (fresh exprIds);
    // name-based resolution must survive that (captured Attributes did not)
    val df = Seq(0.5, 1.5, 2.5, 3.5).toDF("v")
    val bands = df.agg(min(col("v")).as("lo"), (max(col("v")) - 1.0).as("hi"))
    val got = Plans.rangeLookup(df, bands, "v", "lo", "hi")
      .select("v").as[Double].collect().sorted.toSeq
    assert(got == Seq(0.5, 1.5)) // [0.5, 2.5): v in {0.5, 1.5}
    // and the literal self-join form
    val self = Seq((1.0, 0.0, 2.0), (5.0, 4.0, 6.0)).toDF("v", "lo", "hi")
    assert(Plans.rangeLookup(self, self, "v", "lo", "hi").count() == 2)
  }

  test("rangeLookup on lineitem equals the BNL plan row-for-row") {
    val facts = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_extendedprice").cast("double").as("v"), col("l_orderkey"))
    val bands = spark.range(100).select(
      col("id").as("band_id"),
      (lit(900.0) + col("id").cast("double") * 1050.0).as("lo"),
      (lit(1950.0) + col("id").cast("double") * 1050.0).as("hi"))
    val custom = Plans.rangeLookup(facts, bands, "v", "lo", "hi")
      .groupBy("band_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = bnl(facts, bands)
      .groupBy("band_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(custom == expected)
    assert(custom.nonEmpty)
  }

  test("physical plan uses RangeLookupJoinExec; null facts and null bands drop out") {
    val facts = Seq(Some(1.0), None, Some(50.0)).toDF("v")
    val bands = Seq(
      (1L, Some(0.0), Some(10.0)),
      (2L, None, Some(10.0)) // null-bounded band matches nothing
    ).toDF("band_id", "lo", "hi")
    val out = Plans.rangeLookup(
      facts, bands.withColumn("lo", col("lo").cast("double")).withColumn("hi", col("hi").cast("double")),
      "v", "lo", "hi")
    val hasExec = out.queryExecution.executedPlan.collect {
      case e: RangeLookupJoinExec => e
    }.nonEmpty
    assert(hasExec, out.queryExecution.executedPlan.toString)
    val rows = out.select("v", "band_id").as[(Double, Long)].collect().toSet
    assert(rows == Set((1.0, 1L)))
  }

  test("empty bands side yields an empty result, not a crash") {
    val facts = Seq(1.0, 2.0).toDF("v")
    val bands = Seq.empty[(Long, Double, Double)].toDF("band_id", "lo", "hi")
    assert(Plans.rangeLookup(facts, bands, "v", "lo", "hi").count() == 0)
  }
}
