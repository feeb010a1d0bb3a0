package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DSv2 quote source: batched partitions, engine schema, deterministic rows") {
    val syms = (1 to 250).map(i => s"SYM$i:STOCK").mkString(",")
    val df = spark.read
      .format("graft.sources.QuoteSource")
      .option("symbols", syms)
      .option("batchSize", "100")
      .load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("symbol", "asset_type", "price", "percent_change", "change", "high", "low"))
    assert(df.count() == 250)
    // batch partitioning mirrors the reference's request chunking: 250/100 → 3
    assert(df.rdd.getNumPartitions == 3)
    // deterministic across reads
    val a = df.orderBy("symbol").collect().toSeq
    val b = spark.read.format("graft.sources.QuoteSource")
      .option("symbols", syms).option("batchSize", "100").load()
      .orderBy("symbol").collect().toSeq
    assert(a == b)
    // invariants of the synthesized quote document
    val bad = df.filter(col("high") < col("price") || col("low") > col("price"))
    assert(bad.count() == 0)
  }

  test("quote source feeds the realtime job pipeline end-to-end") {
    val requests = Seq(("SYM1", "STOCK"), ("SYM2", "STOCK")).toDF("symbol", "asset_type")
    val emptyStore = Seq.empty[(String, String, Double, Double, Double, Double, Double, java.sql.Timestamp)]
      .toDF("symbol", "asset_type", "price", "percent_change", "change", "high", "low", "updated_at")
    val quotes = spark.read.format("graft.sources.QuoteSource")
      .option("symbols", "SYM1:STOCK,SYM2:STOCK,SYM3:STOCK").load()
    val r = graft.jobs.Jobs.marketDataUpdate(
      requests, emptyStore, quotes, lit("2024-01-01 00:00:00").cast("timestamp"))
    assert(r.store.count() == 2) // only requested symbols land
    assert(r.completion.select("record_count").as[Long].head() == 2L)
  }

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(got == 32.0)
  }
}
