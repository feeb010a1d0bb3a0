package graft.schemas

import java.sql.{Date, Timestamp}

/** Typed rows for the three storage tables (SURVEY.md §1.3: `Dataset[T]`
  * where compile-time field safety is cheap — the stable store schemas; the
  * dynamic ingest side stays untyped DataFrame on purpose).
  */
object Typed {

  /** `market_data` — key (symbol, asset_type). */
  case class MarketData(
      symbol: String,
      asset_type: String,
      price: Double,
      percent_change: Option[Double],
      change: Option[Double],
      high: Option[Double],
      low: Option[Double],
      updated_at: Timestamp)

  /** `market_data_monthly` — key (symbol, date, asset_type). */
  case class MarketDataMonthly(
      symbol: String,
      price: Double,
      date: Date,
      asset_type: String)

  /** `market_index_data` — key (symbol). */
  case class MarketIndexData(
      symbol: String,
      price: Double,
      price_change: Option[Double],
      percent_change: Option[Double],
      price_high: Option[Double],
      price_low: Option[Double],
      updated_at: Timestamp)
}
