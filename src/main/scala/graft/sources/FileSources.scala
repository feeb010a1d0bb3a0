package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-pinned file ingestion with reject routing — the file-format
  * analog of the reference's payload shape guards (B6,
  * `fetch_market_data.py:71-81`): rows that fail to parse against the
  * declared schema are never silently dropped or nulled into the good
  * data; they are routed whole to a rejects side output for quarantine,
  * exactly like the validator split (`Relational.validateRequired`).
  *
  * All three formats are Spark built-ins, so scans stay columnar /
  * codegen'd and get partition pruning + predicate pushdown for free
  * (PushedFilters shows up in `.explain` the same as parquet for ORC;
  * CSV/JSON push projections only). At 100 TB the contract is: land raw
  * text formats once, quarantine rejects, and rewrite into a columnar
  * container (parquet/ORC) — these helpers are the landing step.
  */
object FileSources {

  val CorruptCol = "_corrupt_record"

  /** The user schema extended with the corrupt-record capture column. */
  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** CSV with header, PERMISSIVE mode, malformed lines captured whole. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON-lines, PERMISSIVE mode, malformed documents captured whole. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a PERMISSIVE read into (valid, rejects): a row is a reject iff
    * the corrupt capture column is non-null. Valid rows drop the capture
    * column; rejects keep only (raw record) for quarantine.
    *
    * The split is an EAGER materialization barrier (localCheckpoint) by
    * design, not an optimization accident: Spark prunes unreferenced
    * columns all the way into the CSV/JSON parser, so a downstream query
    * that never touches `price` would never parse it — and a row whose
    * only defect is an unparsable price would silently count as valid.
    * Pinning the full-schema parse first makes validity a property of the
    * ROW, independent of what any consumer later selects. A landing step
    * reads the raw file once and writes both outputs anyway, so the
    * barrier costs nothing extra at scale.
    */
  def splitValid(df: DataFrame): (DataFrame, DataFrame) = {
    val pinned = df.localCheckpoint()
    val valid = pinned.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val rejects = pinned.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw"))
    (valid, rejects)
  }

  /** Columnar ORC round-trip — the rewrite target for landed text data. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
