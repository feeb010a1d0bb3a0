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

  test("quote source: table-driven request list equals the inline list") {
    import spark.implicits._
    // inline: first 7 customers of sf0.001, C-prefixed, via option("symbols")
    val keys = Tables.customer(spark, TestSpark.sf0001)
      .select(col("c_custkey")).orderBy(col("c_custkey")).limit(7)
      .as[Long].collect()
    val inline = spark.read.format("graft.sources.QuoteSource")
      .option("symbols", keys.map(k => s"C$k:STOCK").mkString(","))
      .option("batchSize", "3")
      .load()
    // table-driven: the SOURCE reads the same catalog at scan planning
    val fromTable = spark.read.format("graft.sources.QuoteSource")
      .option("symbolsPath", s"${TestSpark.sf0001}/customer.parquet")
      .option("symbolCol", "c_custkey")
      .option("symbolPrefix", "C")
      .option("maxSymbols", "7")
      .option("batchSize", "3")
      .load()
    assert(fromTable.rdd.getNumPartitions == 3) // 7 symbols / 3 per batch
    assert(fromTable.orderBy("symbol").collect().toSeq ==
      inline.orderBy("symbol").collect().toSeq)
    // inline symbols win when both options are present
    val both = spark.read.format("graft.sources.QuoteSource")
      .option("symbols", "ONLY:STOCK")
      .option("symbolsPath", s"${TestSpark.sf0001}/customer.parquet")
      .option("symbolCol", "c_custkey")
      .load()
    assert(both.select("symbol").as[String].collect().toSeq == Seq("ONLY"))
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

  test("quote source request assembly matches the reference's URL-encoding contract") {
    import graft.sources.QuoteSource
    // urllib.parse.quote semantics: unreserved + '/' pass, the rest
    // percent-encodes (the reference quotes each symbol before comma-join)
    assert(QuoteSource.encodeSymbol("AAPL") == "AAPL")
    assert(QuoteSource.encodeSymbol("^GSPC") == "%5EGSPC")
    assert(QuoteSource.encodeSymbol("BRK.B") == "BRK.B")
    assert(QuoteSource.encodeSymbol("BTC/USD") == "BTC/USD")
    assert(QuoteSource.encodeSymbol("A B") == "A%20B")
    assert(QuoteSource.encodeSymbol("é") == "%C3%A9") // UTF-8 per byte
    // supplementary-plane chars (two UTF-16 surrogates) must encode their
    // UTF-8 bytes, not a '?' per surrogate half
    assert(QuoteSource.encodeSymbol("𝓐") == "%F0%9D%93%90")
    val params = QuoteSource.requestParams(Seq("^DJI", "^GSPC", "AAPL"), "US")
    assert(params == Seq("symbols" -> "%5EDJI,%5EGSPC,AAPL", "region" -> "US"))
    assert(QuoteSource.requestUrl("example-host.test", "market/v2/get-quotes", params) ==
      "https://example-host.test/market/v2/get-quotes?symbols=%5EDJI,%5EGSPC,AAPL&region=US")
    // an endpoint that already carries a query string joins with &, not a
    // second ? (the live reader passes endpoints verbatim)
    assert(QuoteSource.urlWithParams("http://h:9/q?auth=x", Seq("region" -> "US")) ==
      "http://h:9/q?auth=x&region=US")
    // param values with URL metacharacters or non-ASCII are encoded at the
    // assembly point — a region of "a&b=c d" can never smuggle extra params
    // or malform the URL; ',' and '%' stay raw so the pre-encoded
    // comma-joined symbols value keeps the reference's exact wire shape
    assert(QuoteSource.urlWithParams("http://h/q",
      Seq("region" -> "a&b=c d", "symbols" -> "%5EGSPC,AAPL")) ==
      "http://h/q?region=a%26b%3Dc%20d&symbols=%5EGSPC,AAPL")
    assert(QuoteSource.urlWithParams("http://h/q", Seq("region" -> "é")) ==
      "http://h/q?region=%C3%A9")
  }

  /** Localhost fixture server: serves /quotes with scriptable status
    * behavior, counting requests — the reference's 429/404 classifier
    * finally runs against REAL status codes over a real socket.
    */
  private def withFixtureServer[A](
      rateLimitFirst: Int = 0, notFound: Boolean = false, malformedFirst: Int = 0)(
      body: (String, java.util.concurrent.atomic.AtomicInteger) => A): A = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/quotes", (ex: com.sun.net.httpserver.HttpExchange) => {
      val n = hits.incrementAndGet()
      val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val symbols = query.split("&").find(_.startsWith("symbols="))
        .map(_.stripPrefix("symbols=").split(",").toSeq.map(s =>
          java.net.URLDecoder.decode(s, "UTF-8"))).getOrElse(Seq.empty)
      val (status, payload) =
        if (n <= rateLimitFirst) (429, """{"error": "rate limited"}""")
        else if (notFound) (404, """{"error": "not found"}""")
        else if (n <= malformedFirst) (200, """{"unexpected": []}""")
        else {
          val rows = symbols.map(s =>
            s"""{"symbol": "$s", "asset_type": "STOCK", "price": ${s.length}.5,
               | "percent_change": 1.25, "change": 0.5, "high": ${s.length}.75,
               | "low": ${s.length}.25}""".stripMargin.replace("\n", ""))
          (200, s"""{"quoteResponse": {"result": [${rows.mkString(",")}]}}""")
        }
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/quotes", hits)
    finally server.stop(0)
  }

  private def liveQuotes(endpoint: String, symbols: String, extra: Map[String, String] = Map.empty) = {
    val base = spark.read.format("graft.sources.QuoteSource")
      .option("symbols", symbols)
      .option("batchSize", "2")
      .option("endpoint", endpoint)
      .option("retryDelayMs", "1")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("LIVE http quote source: real GET per batch partition, parsed rows, encoded request") {
    withFixtureServer() { (endpoint, hits) =>
      val df = liveQuotes(endpoint, "AAPL:STOCK,^GSPC:INDEX,BRK.B:STOCK")
      // sort locally: a global orderBy adds a range-sampling pass that would
      // re-run the scan (and double the GET count this test pins)
      val rows = df.select("symbol", "asset_type", "price", "high", "low")
        .as[(String, String, Double, Double, Double)].collect().toSeq.sortBy(_._1)
      // ^GSPC round-trips through %5EGSPC percent-encoding and back; the
      // fixture's asset_type overrides the request's (response is truth)
      assert(rows == Seq(
        ("AAPL", "STOCK", 4.5, 4.75, 4.25),
        ("BRK.B", "STOCK", 5.5, 5.75, 5.25),
        ("^GSPC", "STOCK", 5.5, 5.75, 5.25)))
      assert(hits.get() == 2, "one GET per batch partition (3 symbols / batchSize 2)")
    }
  }

  test("LIVE http quote source: 429 rate limit retries then succeeds (reference classifier)") {
    withFixtureServer(rateLimitFirst = 2) { (endpoint, hits) =>
      val df = liveQuotes(endpoint, "AAPL:STOCK,MSFT:STOCK")
      assert(df.count() == 2)
      assert(hits.get() == 3, "two 429s then one 200 — the retry loop took the socket path 3 times")
    }
  }

  test("LIVE http quote source: 404 skips the batch without failing the scan") {
    withFixtureServer(notFound = true) { (endpoint, hits) =>
      val df = liveQuotes(endpoint, "GONE:STOCK")
      assert(df.count() == 0, "404 = symbol set not found → skip, per the reference")
      assert(hits.get() == 1, "404 must NOT retry")
    }
  }

  test("LIVE http quote source: malformed payload classifies as retryable, then parses") {
    withFixtureServer(malformedFirst = 1) { (endpoint, hits) =>
      val df = liveQuotes(endpoint, "AAPL:STOCK")
      assert(df.count() == 1)
      assert(hits.get() == 2, "missing quoteResponse → ValueError-equivalent → one retry")
    }
  }

  test("fetchParsedWithRetry: terminal failure after maxRetries, sleep cadence observed") {
    withFixtureServer(rateLimitFirst = Int.MaxValue) { (endpoint, hits) =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val r = graft.sources.HttpFetch.fetchParsedWithRetry[String](
        endpoint + "?symbols=X", identity, maxRetries = 3, retryDelayMs = 7L, sleep = sleeps += _)
      assert(r.isInstanceOf[graft.sources.HttpFetch.Failed])
      assert(r.asInstanceOf[graft.sources.HttpFetch.Failed].reason.contains("HTTP 429"))
      assert(hits.get() == 4, "initial attempt + 3 retries")
      assert(sleeps.toSeq == Seq(7L, 7L, 7L), "sleeps between attempts, none after the last")
    }
  }

  test("csv/jsonl landing: schema-pinned parse routes malformed rows to rejects") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("price", DoubleType)))
    val dir = Files.createTempDirectory("graft-land")
    val csvPath = dir.resolve("q.csv")
    Files.write(csvPath, java.util.Arrays.asList(
      "symbol,price", "AAPL,101.5", "MSFT,not_a_number", "GOOG,99.0"))
    val (csvOk, csvBad) = graft.sources.FileSources.splitValid(
      graft.sources.FileSources.csv(spark, csvPath.toString, schema))
    assert(csvOk.select("symbol").as[String].collect().toSet == Set("AAPL", "GOOG"))
    assert(csvBad.select("raw").as[String].collect().toSeq == Seq("MSFT,not_a_number"))
    val jsonPath = dir.resolve("q.jsonl")
    Files.write(jsonPath, java.util.Arrays.asList(
      """{"symbol":"AAPL","price":101.5}""", """{"symbol":"MSFT","price":}""",
      """{"symbol":"GOOG","price":99.0}"""))
    val (jsOk, jsBad) = graft.sources.FileSources.splitValid(
      graft.sources.FileSources.jsonl(spark, jsonPath.toString, schema))
    assert(jsOk.select("symbol").as[String].collect().toSet == Set("AAPL", "GOOG"))
    assert(jsBad.count() == 1)
  }

  test("orc round-trip preserves schema and rows; predicate pushdown reaches the scan") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-orc").resolve("docs").toString
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "lang", "n_chars")
    graft.sources.FileSources.writeOrc(docs, dir)
    val back = graft.sources.FileSources.orc(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    val plan = back.filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"pushdown missing in:\n$plan")
  }

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(got == 32.0)
  }
}
