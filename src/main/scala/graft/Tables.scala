package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated testdata (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (partitioned parquet /
  * iceberg); the engine only ever sees `DataFrame`s, so the loader is the
  * single seam where storage layout changes. All reads go through here so
  * column pruning / predicate pushdown land on the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw ns-longs
    * (`nanosAsLong`) and floor to microseconds — exactly what DuckDB's reader
    * does — so both engines see identical µs timestamps.
    *
    * The raw column survives as `ts_ns`: a filter on the DERIVED `ts` cannot
    * reach the parquet scan (it's an expression over the long), but a filter
    * on `ts_ns` pushes down as a plain long range — at 100 TB of events that
    * is the difference between scanning a time slice and scanning the table.
    * Use [[eventsTsRange]] for time-sliced reads.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // session-level BY DESIGN (the legacy flag has no per-read form): every
    // session built by this engine reads ns-precision parquet as raw longs.
    // The visible side effect is that other ns-timestamp parquet reads in
    // the same session also get longs instead of PARQUET_TYPE_ILLEGAL —
    // callers mixing in ns data of their own should read it through this
    // convention too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Epoch nanoseconds of an ISO-8601 UTC instant — the unit `ts_ns`
    * predicates must compare in so they push down to the parquet scan
    * (a predicate on the derived µs `ts` would not). Shared by every
    * time-sliced query cutoff.
    */
  def ns(isoUtc: String): Long = {
    val i = java.time.Instant.parse(isoUtc)
    i.getEpochSecond * 1000000000L + i.getNano
  }

  /** Events within [start, end) wall-clock UTC, with the time predicate
    * pushed to the parquet scan in raw-ns space.
    */
  def eventsTsRange(
      spark: SparkSession, dir: String,
      startUtc: java.time.Instant, endUtc: java.time.Instant): DataFrame =
    events(spark, dir)
      .filter(col("ts_ns") >= ns(startUtc.toString) && col("ts_ns") < ns(endUtc.toString))
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
