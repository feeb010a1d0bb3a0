package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for every external document shape the reference
  * ingests (SURVEY.md §1.3, FIXTURES.md §A) — the schema-on-read contract for
  * `from_json` ingestion. Numeric quote fields arrive as STRINGS (the API
  * serializes them quoted, e.g. close "204.60001"); coercion to double is an
  * explicit `cast` step (Relational.coerceDouble), not schema magic, matching
  * the reference's float() at insert time.
  */
object Schemas {

  /** Twelve Data realtime quote document (mock_responses.py:2-30): ~20 scalar
    * fields plus the nested fifty_two_week struct.
    */
  val quoteDocument: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("name", StringType),
    StructField("exchange", StringType),
    StructField("mic_code", StringType),
    StructField("currency", StringType),
    StructField("datetime", StringType),
    StructField("timestamp", LongType),
    StructField("last_quote_at", LongType),
    StructField("open", StringType),
    StructField("high", StringType),
    StructField("low", StringType),
    StructField("close", StringType),
    StructField("volume", StringType),
    StructField("previous_close", StringType),
    StructField("change", StringType),
    StructField("percent_change", StringType),
    StructField("average_volume", StringType),
    StructField("is_market_open", BooleanType),
    StructField("fifty_two_week", StructType(Seq(
      StructField("low", StringType),
      StructField("high", StringType),
      StructField("low_change", StringType),
      StructField("high_change", StringType),
      StructField("low_change_percent", StringType),
      StructField("high_change_percent", StringType),
      StructField("range", StringType))))))

  /** Twelve Data time-series response (etl/utils.py:278-282): values array of
    * (datetime, close) rows.
    */
  val timeSeriesDocument: StructType = StructType(Seq(
    StructField("meta", StructType(Seq(
      StructField("symbol", StringType),
      StructField("interval", StringType)))),
    StructField("values", ArrayType(StructType(Seq(
      StructField("datetime", StringType),
      StructField("open", StringType),
      StructField("high", StringType),
      StructField("low", StringType),
      StructField("close", StringType))))),
    StructField("status", StringType)))

  /** Yahoo get-quotes envelope (etl/utils.py:117-127). */
  val yahooQuoteEnvelope: StructType = StructType(Seq(
    StructField("quoteResponse", StructType(Seq(
      StructField("result", ArrayType(StructType(Seq(
        StructField("symbol", StringType),
        StructField("regularMarketPrice", DoubleType),
        StructField("regularMarketChange", DoubleType),
        StructField("regularMarketChangePercent", DoubleType),
        StructField("regularMarketDayHigh", DoubleType),
        StructField("regularMarketDayLow", DoubleType))))),
      StructField("error", StringType))))))

  /** Kafka request payloads (FIXTURES.md §A2). */
  val marketDataRequest: StructType = StructType(Seq(
    StructField("assets", ArrayType(StructType(Seq(
      StructField("symbol", StringType),
      StructField("asset_type", StringType)))))))

  val historicalRequest: StructType = StructType(Seq(
    StructField("assets", ArrayType(StructType(Seq(
      StructField("symbol", StringType),
      StructField("asset_type", StringType))))),
    StructField("start_date", StringType),
    StructField("end_date", StringType)))

  val indexRequest: StructType = StructType(Seq(
    StructField("symbols", ArrayType(StringType))))

  /** Storage-table schemas (FIXTURES.md §A1). */
  val marketData: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("asset_type", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("percent_change", DoubleType),
    StructField("change", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("updated_at", TimestampType)))

  val marketDataMonthly: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("asset_type", StringType, nullable = false)))

  val marketIndexData: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("price_change", DoubleType),
    StructField("percent_change", DoubleType),
    StructField("price_high", DoubleType),
    StructField("price_low", DoubleType),
    StructField("updated_at", TimestampType)))
}
