package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational
import graft.schemas.Schemas

/** Parses the reference's own canonical fixture documents (FIXTURES.md §A3/A4
  * values) through the engine's ingestion path: from_json with explicit
  * schema → required-field validation → string→double coercion.
  */
class SchemasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val quoteJson =
    """{"symbol":"AAPL","name":"Apple Inc","exchange":"NASDAQ","mic_code":"XNGS",
      |"currency":"USD","datetime":"2023-06-14","timestamp":1686757800,
      |"last_quote_at":1686757800,"open":"203.91000","high":"208.00000",
      |"low":"202.80000","close":"204.60001","volume":"48714100",
      |"previous_close":"199.74001","change":"4.86000","percent_change":"2.43316",
      |"average_volume":"56021400","is_market_open":false,
      |"fifty_two_week":{"low":"164.08000","high":"212.38000","low_change":"40.52000",
      |"high_change":"-7.78000","low_change_percent":"24.69519",
      |"high_change_percent":"-3.66326","range":"164.080002 - 212.380005"}}""".stripMargin.replace("\n", "")

  test("Twelve Data quote doc: parse, validate required fields, coerce strings to double") {
    val parsed = Seq(quoteJson).toDF("raw")
      .select(from_json(col("raw"), Schemas.quoteDocument).as("q"))
      .select("q.*")
    val row = parsed
      .select(
        col("symbol"),
        Relational.coerceDouble(col("close")).as("price"),
        Relational.coerceDouble(col("percent_change")).as("percent_change"),
        Relational.coerceDouble(col("change")).as("change"),
        Relational.coerceDouble(col("high")).as("high"),
        Relational.coerceDouble(col("low")).as("low"),
        col("fifty_two_week.low").as("f2w_low"),
        col("is_market_open"))
    val valid = Relational.filterValid(
      row, Seq("symbol", "price", "percent_change", "change", "high", "low"))
    assert(valid.count() == 1)
    val r = row.as[(String, Double, Double, Double, Double, Double, String, Boolean)].head()
    assert(r == (("AAPL", 204.60001, 2.43316, 4.86, 208.0, 202.8, "164.08000", false)))
  }

  test("missing/null required field fails validation (reject path)") {
    val noClose = quoteJson.replace("\"close\":\"204.60001\",", "")
    val parsed = Seq(noClose).toDF("raw")
      .select(from_json(col("raw"), Schemas.quoteDocument).as("q"))
      .select(
        col("q.symbol").as("symbol"),
        Relational.coerceDouble(col("q.close")).as("price"))
    assert(Relational.filterValid(parsed, Seq("symbol", "price")).count() == 0)
    val tagged = Relational.validateRequired(parsed, Seq("symbol", "price"))
    assert(tagged.filter(!col("valid")).count() == 1)
  }

  test("Yahoo envelope: unwrap result array and rename-project to engine fields") {
    val yahooJson =
      """{"quoteResponse":{"result":[
        |{"symbol":"^GSPC","regularMarketPrice":5432.1,"regularMarketChange":12.3,
        |"regularMarketChangePercent":0.23,"regularMarketDayHigh":5440.0,"regularMarketDayLow":5410.5},
        |{"symbol":"^NDX","regularMarketPrice":19876.5,"regularMarketChange":-45.6,
        |"regularMarketChangePercent":-0.23,"regularMarketDayHigh":19950.0,"regularMarketDayLow":19800.0}
        |],"error":null}}""".stripMargin.replace("\n", "")
    val rows = Seq(yahooJson).toDF("raw")
      .select(from_json(col("raw"), Schemas.yahooQuoteEnvelope).as("e"))
      .select(explode(col("e.quoteResponse.result")).as("r"))
      .select("r.*")
    val projected = Relational.renameProject(rows, Seq(
      "symbol" -> "symbol",
      "regularMarketPrice" -> "price",
      "regularMarketChange" -> "price_change",
      "regularMarketChangePercent" -> "percent_change",
      "regularMarketDayHigh" -> "price_high",
      "regularMarketDayLow" -> "price_low"))
    val got = projected.as[(String, Double, Double, Double, Double, Double)].collect().toSet
    assert(got == Set(
      ("^GSPC", 5432.1, 12.3, 0.23, 5440.0, 5410.5),
      ("^NDX", 19876.5, -45.6, -0.23, 19950.0, 19800.0)))
  }

  test("typed storage rows: engine snapshot round-trips through Dataset[MarketData]") {
    import graft.schemas.Typed.MarketData
    val snap = graft.SparkEntry.qLatestSnapshotUpsert(spark, TestSpark.sf0001)
      .select(
        col("symbol").cast("string").as("symbol"),
        col("asset_type"),
        col("price"),
        col("percent_change"),
        col("change"),
        lit(null).cast("double").as("high"),
        lit(null).cast("double").as("low"),
        col("updated_at").cast("timestamp").as("updated_at"))
      .as[MarketData]
    val rows = snap.collect()
    assert(rows.nonEmpty)
    // compile-time field access + typed transform
    val maxPrice = snap.map(_.price).reduce(math.max _)
    assert(rows.map(_.price).max == maxPrice)
    assert(rows.forall(_.high.isEmpty))
  }

  test("request payloads parse with shape guards") {
    val req = """{"assets":[{"symbol":"AAPL","asset_type":"STOCK"},{"symbol":"BTC","asset_type":"CRYPTO"}],
                |"start_date":"2020-01-01","end_date":"2024-12-31"}""".stripMargin.replace("\n", "")
    val assets = Seq(req).toDF("raw")
      .select(from_json(col("raw"), Schemas.historicalRequest).as("p"))
      .select(col("p.start_date"), col("p.end_date"), explode(col("p.assets")).as("a"))
      .select(col("a.symbol"), col("a.asset_type"), col("start_date"), col("end_date"))
      .filter(col("symbol").isNotNull && col("asset_type").isNotNull)
    assert(assets.count() == 2)
    // malformed payload → all-null struct fields (PERMISSIVE); the B6 shape
    // guard is the required-key null check, which drops it without exception
    val bad = Seq("not json at all").toDF("raw")
      .select(from_json(col("raw"), Schemas.historicalRequest).as("p"))
      .filter(col("p.assets").isNotNull)
    assert(bad.count() == 0)
  }
}
