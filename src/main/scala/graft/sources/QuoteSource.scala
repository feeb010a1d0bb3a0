package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 quote source — the live-parity seam for the reference's HTTP
  * fetchers (SURVEY.md §2.A A3-A7): `spark.read.format("graft.sources.QuoteSource")
  * .option("symbols", "AAPL:STOCK,BTC:CRYPTO").option("batchSize", "100").load()`.
  *
  * The request list comes either inline (`symbols`, the reference's message
  * payload shape) or from a TABLE (`symbolsPath` + `symbolCol` [+
  * `symbolPrefix`/`assetType`/`maxSymbols`]): the source reads the parquet
  * symbol catalog itself during `planInputPartitions` — driver-side scan
  * planning, exactly where every file source lists its files — so callers
  * never collect a request list through the session. The list is bounded by
  * construction (it is a request payload, like every reference batch).
  *
  * Partitioning mirrors the reference's request batching: one input partition
  * per `batchSize` symbols (`fetch_market_data.py:93`), so on a cluster each
  * task issues one batched fetch — the unit of parallelism is the API batch,
  * and executors fan out across batches instead of a driver-side loop.
  *
  * Two fetch modes: with an `endpoint` option (e.g.
  * `http://host:port/quotes`, plus `region`/`maxRetries`/`retryDelayMs`)
  * each partition performs the REAL batched GET with the reference's
  * 429-retry / 404-skip classifier ([[HttpQuotePartitionReader]] —
  * exercised against a live localhost fixture in SourcesSpec); without it,
  * [[QuotePartitionReader]] synthesizes deterministic hash-derived quotes
  * (the broker-less default, SQL-re-derivable by the q_quote_source
  * oracle). Provider registration, schema, batch planning, per-partition
  * readers and column order are identical in both modes.
  */
class QuoteSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = QuoteSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QuoteTable(new CaseInsensitiveStringMap(properties))
}

object QuoteSource {
  /** Engine-facing quote row: already projected/coerced (B2/B3 applied at the
    * source boundary so downstream plans see clean doubles).
    */
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("asset_type", StringType, nullable = false),
    StructField("price", DoubleType),
    StructField("percent_change", DoubleType),
    StructField("change", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType)))

  def parseSymbols(options: CaseInsensitiveStringMap): Seq[(String, String)] =
    Option(options.get("symbols")).map(_.split(",").toSeq.filter(_.nonEmpty).flatMap { s =>
      // ":" splits to an empty array — skip such malformed entries instead
      // of crashing scan planning (mirrors the payload shape guards)
      s.split(":") match {
        case Array(sym, at, _*) if sym.trim.nonEmpty => Some((sym.trim, at.trim))
        case Array(sym) if sym.trim.nonEmpty         => Some((sym.trim, "STOCK"))
        case _                                       => None
      }
    }).getOrElse(Seq.empty)

  /** Table-driven request list: first `maxSymbols` values of `symbolCol` in
    * the parquet at `symbolsPath`, ordered by the raw column (so numeric
    * keys order numerically before stringification), prefixed and typed.
    * Runs at scan-planning time on the driver — the request-list analog of
    * file listing.
    */
  def symbolsFromTable(options: CaseInsensitiveStringMap): Seq[(String, String)] =
    Option(options.get("symbolsPath")).map { path =>
      import org.apache.spark.sql.SparkSession
      import org.apache.spark.sql.functions.col
      val keyCol = Option(options.get("symbolCol")).getOrElse("symbol")
      val at = Option(options.get("assetType")).getOrElse("STOCK")
      val prefix = Option(options.get("symbolPrefix")).getOrElse("")
      val maxSymbols = Option(options.get("maxSymbols")).map(_.toInt).getOrElse(Int.MaxValue)
      SparkSession.active.read.parquet(path)
        .select(col(keyCol))
        // NULL keys would stringify into fabricated symbols ("Cnull") and
        // the source would fetch quotes for assets that don't exist
        .filter(col(keyCol).isNotNull)
        .orderBy(col(keyCol))
        .limit(maxSymbols)
        .select(col(keyCol).cast("string"))
        .collect()
        .toSeq
        .map(r => (prefix + r.getString(0), at))
    }.getOrElse(Seq.empty)

  /** Inline `symbols` wins; otherwise the `symbolsPath` table. */
  def resolveSymbols(options: CaseInsensitiveStringMap): Seq[(String, String)] = {
    val inline = parseSymbols(options)
    if (inline.nonEmpty) inline else symbolsFromTable(options)
  }

  /** RFC-3986 percent-encoding of one symbol with urllib.parse.quote
    * semantics (unreserved characters and '/' pass through) — the encoding
    * the reference applies per symbol before comma-joining the batched
    * request parameter (`etl/utils.py:98-105`: `",".join([quote(symbol)
    * for symbol in symbols])`). Index tickers like `^GSPC` become
    * `%5EGSPC`; multi-byte characters encode per UTF-8 byte.
    */
  def encodeSymbol(s: String): String = pctEncode(s, Set.empty)

  /** urllib.parse.quote-style percent-encoding (unreserved characters and
    * '/' pass through; `safeExtra` chars additionally pass through),
    * iterating UTF-8 BYTES, not UTF-16 chars: a supplementary-plane char
    * (emoji, math letters) is two surrogates char-wise, and encoding a
    * lone surrogate yields '?' — byte-wise matches urllib exactly (all
    * multi-byte sequences have the high bit set, so the ASCII
    * pass-through test below can never match half a character).
    */
  private def pctEncode(s: String, safeExtra: Set[Char]): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map { b =>
      val c = b.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-' || c == '~' ||
        c == '/' || safeExtra(c))
        c.toString
      else f"%%${b & 0xff}%02X"
    }.mkString

  /** The batched GET's query parameters, reference shape: the encoded
    * comma-joined symbol list plus the region.
    */
  def requestParams(symbols: Seq[String], region: String): Seq[(String, String)] =
    Seq("symbols" -> symbols.map(encodeSymbol).mkString(","), "region" -> region)

  /** Append query params to a base URL — the ONE `k=v&…` assembly point for
    * the stub URL builder and the live reader; respects a query string the
    * endpoint already carries (`…/quotes?auth=x` + params joins with `&`).
    *
    * Keys and values are percent-encoded here, so a region (or any other
    * param) containing '&', '=', a space or non-ASCII can never malform
    * the request URL. Two characters stay raw in VALUES by contract:
    * ',' (the reference comma-joins pre-quoted symbols, so commas are a
    * deliberate raw separator on the wire — `etl/utils.py:98-105`) and
    * '%' (the symbols value arrives pre-percent-encoded from
    * [[encodeSymbol]]; re-encoding would double-escape it). A value
    * wanting a LITERAL percent sign must therefore pre-encode it as %25 —
    * the standard "values are URI fragments" posture.
    */
  def urlWithParams(base: String, params: Seq[(String, String)]): String =
    base + (if (base.contains("?")) "&" else "?") +
      params.map { case (k, v) =>
        s"${pctEncode(k, Set.empty)}=${pctEncode(v, Set(',', '%'))}"
      }.mkString("&")

  /** Full request URL (`https://{host}/{path}?k=v&…`) — what
    * [[QuotePartitionReader]]'s stubbed fetch would GET per batch in a
    * live deployment.
    */
  def requestUrl(host: String, path: String, params: Seq[(String, String)]): String =
    urlWithParams(s"https://$host/$path", params)
}

private class QuoteTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_quotes"
  override def schema(): StructType = QuoteSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives dsv2 properties; reader options come through here
    val merged = if (caseInsensitiveOptions.isEmpty) options else caseInsensitiveOptions
    new QuoteScanBuilder(merged)
  }
}

private class QuoteScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder with Scan with Batch {
  private val batchSize = Option(options.get("batchSize")).map(_.toInt).getOrElse(100)
  private val endpoint = Option(options.get("endpoint")).getOrElse("")
  private val region = Option(options.get("region")).getOrElse("US")
  private val maxRetries = Option(options.get("maxRetries")).map(_.toInt).getOrElse(3)
  private val retryDelayMs = Option(options.get("retryDelayMs")).map(_.toLong).getOrElse(60000L)
  // resolved lazily so a table-driven request list is read at scan planning,
  // not at DataFrameReader.load()
  private lazy val symbols = QuoteSource.resolveSymbols(options)

  override def build(): Scan = this
  override def readSchema(): StructType = QuoteSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    symbols.grouped(batchSize)
      .map(g => QuoteBatch(g.toArray, endpoint, region, maxRetries, retryDelayMs): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory = new QuoteReaderFactory
}

private case class QuoteBatch(
    symbols: Array[(String, String)],
    endpoint: String,
    region: String,
    maxRetries: Int,
    retryDelayMs: Long) extends InputPartition

private class QuoteReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val b = partition.asInstanceOf[QuoteBatch]
    if (b.endpoint.nonEmpty) new HttpQuotePartitionReader(b)
    else new QuotePartitionReader(b.symbols)
  }
}

/** LIVE partition reader: ONE batched GET per input partition — the unit of
  * parallelism is the API batch, same as the stub path — with the
  * reference's retry/skip classifier executing against the real status
  * codes ([[HttpFetch.fetchParsedWithRetry]]): 429 retries then fails the
  * task, 404 skips the batch (zero rows — a missing symbol set is data),
  * malformed payloads (missing `quoteResponse`/`result`, the reference's
  * ValueError guards at `etl/utils.py:117-126`) classify as retryable.
  * Response rows are parsed with Jackson (on Spark's classpath) from the
  * engine-shaped `{"quoteResponse": {"result": [...]}}` wire form; rows
  * missing `symbol` are dropped (the B6 payload guard), numeric fields
  * absent or non-numeric become NULL (B3 coercion at the source boundary).
  */
private class HttpQuotePartitionReader(batch: QuoteBatch)
    extends PartitionReader[InternalRow] {
  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def fetchRows(): Iterator[InternalRow] = {
    val bySymbol = batch.symbols.toMap
    val url = QuoteSource.urlWithParams(
      batch.endpoint,
      QuoteSource.requestParams(batch.symbols.map(_._1).toSeq, batch.region))
    HttpFetch.fetchParsedWithRetry(
      url, parseQuotes(bySymbol, _), batch.maxRetries, batch.retryDelayMs) match {
      case HttpFetch.Fetched(rs) => rs.iterator
      case HttpFetch.NotFound => Iterator.empty
      case HttpFetch.Failed(reason) =>
        throw new java.io.IOException(s"quote fetch failed for batch of ${batch.symbols.length}: $reason")
    }
  }

  private def parseQuotes(
      bySymbol: Map[String, String], body: String): Seq[InternalRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.readTree(body)
    if (root == null || !root.has("quoteResponse"))
      throw new java.io.IOException("Invalid API response format: missing 'quoteResponse' field")
    val qr = root.get("quoteResponse")
    if (!qr.has("result"))
      throw new java.io.IOException("Invalid API response format: missing 'result' field in 'quoteResponse'")
    val result = qr.get("result")
    import scala.jdk.CollectionConverters._
    result.elements().asScala.flatMap { n =>
      if (!n.has("symbol")) None
      else {
        val sym = n.get("symbol").asText
        val at =
          if (n.has("asset_type")) n.get("asset_type").asText
          else bySymbol.getOrElse(sym, "STOCK")
        def dbl(f: String): Any =
          if (n.has(f) && n.get(f).isNumber) java.lang.Double.valueOf(n.get(f).asDouble) else null
        Some(InternalRow(
          UTF8String.fromString(sym),
          UTF8String.fromString(at),
          dbl("price"), dbl("percent_change"), dbl("change"), dbl("high"), dbl("low")))
      }
    }.toSeq
  }

  override def next(): Boolean = {
    if (rows == null) rows = fetchRows()
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private class QuotePartitionReader(symbols: Array[(String, String)])
    extends PartitionReader[InternalRow] {
  private var i = -1

  override def next(): Boolean = { i += 1; i < symbols.length }

  /** STUB fetch — a deployment sets the `endpoint` option instead, routing
    * the batch through [[HttpQuotePartitionReader]]'s real GET of
    * `QuoteSource.requestUrl(host, path, requestParams(batch symbols,
    * region))` (Twelve Data `/quote`, Yahoo get-quotes). Deterministic
    * hash-derived fields so tests are stable AND SQL-re-derivable: the
    * q_quote_source oracle folds this exact Java String.hashCode
    * arithmetic.
    */
  override def get(): InternalRow = {
    val (sym, at) = symbols(i)
    val h = (sym + ":" + at).hashCode.toLong & 0x7FFFFFFFL
    val price = 10.0 + (h % 100000L) / 100.0
    val change = ((h >> 8) % 2000L - 1000L) / 100.0
    InternalRow(
      UTF8String.fromString(sym),
      UTF8String.fromString(at),
      price,
      if (price - change != 0.0) change / (price - change) * 100.0 else 0.0,
      change,
      price + math.abs(change),
      price - math.abs(change))
  }
  override def close(): Unit = ()
}
