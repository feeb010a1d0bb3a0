package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Bucketed-layout co-location: two tables bucketed identically on the
  * join key must join with NO shuffle exchange (the 100 TB recurring-join
  * contract), and results must equal the plain join.
  */
class LayoutBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed tables join without any shuffle exchange, same results as plain join") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, TestSpark.sf0001)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    Layout.writeBucketed(orders, "bk_orders", Seq("o_custkey"), buckets = 8,
      sortCols = Seq("o_custkey"))
    Layout.writeBucketed(cust, "bk_cust", Seq("o_custkey"), buckets = 8,
      sortCols = Seq("o_custkey"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the SMJ path: broadcast would trivially avoid the shuffle for
      // a dim-sized side, but the bucketing contract is about fact-fact
      // joins where neither side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bk_orders").join(spark.table("bk_cust"), "o_custkey")
        .select(col("o_orderkey"), col("c_name"))
      val rows = j.collect()
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"), s"expected SMJ:\n$finalPlan")
      assert(!finalPlan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$finalPlan")
      assert(finalPlan.contains("Bucketed: true"), s"expected bucketed scans:\n$finalPlan")
      val plain = orders.join(cust, "o_custkey").select(col("o_orderkey"), col("c_name"))
        .as[(Long, String)].collect().toSet
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet == plain)
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_cust")
    }
  }

  test("mismatched bucket counts fall back to a shuffled plan (contract is count-sensitive)") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, "p"), (2L, "q")).toDF("k", "vb")
    Layout.writeBucketed(a, "bk_a4", Seq("k"), buckets = 4)
    Layout.writeBucketed(b, "bk_b2", Seq("k"), buckets = 2)
    try {
      val j = spark.table("bk_a4").join(spark.table("bk_b2"), "k")
      j.collect()
      // one side (or both) must shuffle or coalesce buckets; the point is
      // the co-location guarantee only holds for EQUAL bucket counts
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange") || plan.contains("CoalescedBucket"),
        s"expected a fallback plan marker:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a4")
      spark.sql("DROP TABLE IF EXISTS bk_b2")
    }
  }
}
