package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops._

/** The three reference job pipelines (SURVEY.md §3), composed from graft.ops
  * operators as pure batch functions: request relation in → (updated store,
  * completion payload) out. The "fetch" step — an HTTP call in the reference —
  * is a join against a quotes/series feed DataFrame (tests feed parquet; a
  * live deployment would plug a DataSource V2 HTTP source, SURVEY.md §2.A A3).
  */
object Jobs {

  /** A job's output: the new store contents plus the completion stats row
    * (B17). `processingTimeMs` is driver wall-clock like the reference —
    * attached by the caller, not computed here, to keep jobs pure.
    *
    * `perBatch` is the per-batch completion relation (one payload row per
    * batch, `Batching.completionPerBatch`) for jobs whose reference
    * counterpart publishes inside the batch loop — only the historical job
    * does (`fetch_historical_market_data.py:207-213`); the market-data and
    * index jobs publish a single final message, so they carry None.
    */
  case class JobResult(
      store: DataFrame,
      completion: DataFrame,
      perBatch: Option[DataFrame] = None)

  val SnapshotKeys: Seq[String] = Seq("symbol", "asset_type")
  val RequiredFields: Seq[String] =
    Seq("symbol", "asset_type", "price", "percent_change", "change", "high", "low")

  /** §3.1 MARKET_DATA_UPDATE_REQUEST: anti-join update planning → fetch
    * (join) → required-field validation → last-wins upsert → completion.
    */
  def marketDataUpdate(
      requests: DataFrame, // (symbol, asset_type)
      store: DataFrame,    // snapshot keyed (symbol, asset_type)
      quotes: DataFrame,   // feed with RequiredFields columns
      now: Column): JobResult = {
    val needed = Incremental.needingUpdate(requests, store, SnapshotKeys)
    val fetched = needed.join(quotes, SnapshotKeys)
    // pinned ONCE: a live quotes source is nondeterministic, and the two
    // outputs (store and completion) must describe the SAME evaluation —
    // same contract as indexUpdate
    val valid = Relational.filterValid(fetched, RequiredFields)
      .withColumn("updated_at", now)
      .localCheckpoint(true)
    // EXCLUDED-wins via explicit source priority (fresh=1 > store=0), like
    // historicalBackfill: ordering by updated_at alone can TIE (a stored
    // row from a retried run carries the same pinned `now`), making the
    // winner arbitrary where the reference's ON CONFLICT is deterministic
    val updated = Merge.upsert(
      store.withColumn("__src", lit(0)),
      valid.withColumn("__src", lit(1)),
      SnapshotKeys, Seq(col("__src"), col("updated_at"))).drop("__src")
    val completion = valid
      .agg(
        count(lit(1)).as("record_count"),
        ceil(count(lit(1)) / lit(100.0)).cast("long").as("total_batches"),
        // the job's asset identity is the composite key — a symbol listed
        // under two asset types is two assets, like the reference's
        // len(assets) over (symbol, asset_type) request entries
        countDistinct(col("symbol"), col("asset_type")).as("total_assets"))
      .withColumn("status", lit("complete"))
    JobResult(updated, completion)
  }

  /** §3.2 HISTORICAL_MARKET_DATA_REQUEST: coverage scan → month-gap
    * detection → range-bounded fetch (join) → monthly last-close → upsert
    * keyed (symbol, date, asset_type) → completion.
    */
  def historicalBackfill(
      requests: DataFrame, // (symbol, asset_type)
      store: DataFrame,    // monthly rows (symbol, date, asset_type, price)
      series: DataFrame,   // feed (symbol, asset_type, datetime ts, close)
      start: Column,
      stop: Column): JobResult = {
    val gaps = Incremental.gapDetection(
      requests, store.select(col("symbol"), col("asset_type"), col("date")),
      Seq("symbol", "asset_type"), "date", start, stop)
    // fetch one [gap_start, gap_end] span per key (range coalescing,
    // fetch_utils.py:231), over-fetching then collapsing via upsert.
    // Pinned ONCE: a live series feed is nondeterministic, and the three
    // outputs (store, completion, per-batch payloads) must all describe
    // the SAME evaluation
    val fetched = series
      .join(gaps, Seq("symbol", "asset_type"))
      .filter(
        col("datetime") >= col("gap_start") &&
          col("datetime") < add_months(col("gap_end"), 1))
      .localCheckpoint(true)
    // close rides as the final tiebreaker: two feed rows with the same
    // (symbol, type, datetime) — duplicate delivery or a vendor correction —
    // must resolve deterministically (Merge.lastWins' total-order contract);
    // feeds carrying an event id should include it in the projection instead
    val monthly = Merge.lastWins(
      fetched
        .withColumn("date", to_date(date_trunc("month", col("datetime"))))
        .select(col("symbol"), col("asset_type"), col("date"), col("close").as("price"), col("datetime")),
      Seq("symbol", "asset_type", "date"),
      Seq(col("datetime"), col("price"))).drop("datetime")
    // EXCLUDED-wins (ON CONFLICT DO UPDATE SET price = EXCLUDED.price,
    // fetch_historical_market_data.py:92-103): a coalesced [gap_start,
    // gap_end] span can re-fetch months the store already covers, and the
    // freshly fetched value must ALWAYS replace the stored one — so order the
    // merge by an explicit source-priority column (delta=1 > store=0), never
    // by a payload value.
    val updated = Merge.upsert(
      store.withColumn("__src", lit(0)),
      monthly.withColumn("__src", lit(1)),
      Seq("symbol", "asset_type", "date"), Seq(col("__src"))).drop("__src")
    // per-batch completion events (publish-inside-the-loop,
    // fetch_historical_market_data.py:207-213): requested symbols batched
    // 50 per asset type, one payload row per batch with the batch's symbol
    // list and its fetched-record count (0-record symbols still listed)
    val symbolBatches = Batching.assignBatches(
      requests.select(col("symbol"), col("asset_type")).distinct(),
      Seq("asset_type"), "symbol", 50)
    // total_batches must RECONCILE with the per-batch payloads: batching is
    // per asset type, so the total is the number of (asset_type, batch_id)
    // slots — a global ceil(distinct symbols / 50) undercounts whenever
    // more than one asset type is requested
    val nBatches = symbolBatches
      .select(col("asset_type"), col("batch_id")).distinct()
      .agg(count(lit(1)).as("total_batches"))
    // record counts are over FETCHED rows (the reference's len(data) /
    // total_record_count), not the collapsed monthly rows — a month with 30
    // daily feed rows counts 30 fetched records but stores one row
    val completion = fetched
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("symbol")).as("total_symbols"))
      .crossJoin(broadcast(nBatches))
      .select(col("record_count"), col("total_batches"), col("total_symbols"))
      .withColumn("status", lit("complete"))
    val perBatch = Batching
      .completionPerBatch(
        symbolBatches, fetched.select(col("symbol"), col("asset_type")),
        Seq("asset_type"), "symbol")
      .withColumn("start_date", to_date(start))
      .withColumn("end_date", to_date(stop))
    JobResult(updated, completion, Some(perBatch))
  }

  /** §3.3 error path — stale-on-error fallback
    * (`fetch_market_index_data.py:205-221`): if the fetch (or any downstream
    * step) throws, serve the cached rows for the requested symbols with a
    * degraded status instead of failing the job.
    */
  def indexUpdateWithFallback(
      requests: DataFrame,
      store: DataFrame,
      fetchQuotes: () => DataFrame,
      now: Column): JobResult =
    try {
      val r = indexUpdate(requests, store, fetchQuotes(), now)
      // pin the evaluated result, not just probe it: an un-checkpointed
      // lineage would RE-RUN the fetch at the caller's action, where a
      // flaky source could throw outside this try (or return different
      // rows than the ones probed here)
      JobResult(
        r.store.localCheckpoint(true), r.completion.localCheckpoint(true),
        r.perBatch.map(_.localCheckpoint(true)))
    } catch {
      case scala.util.control.NonFatal(_) =>
        val cached = store.join(requests, Seq("symbol"), "left_semi")
        val completion = cached
          .agg(count(lit(1)).as("record_count"), countDistinct(col("symbol")).as("total_symbols"))
          .withColumn("total_batches", lit(0L))
          .withColumn("status", lit("stale_fallback"))
        JobResult(store, completion)
    }

  /** B15 — retry-queue partition: split a fetch-attempt relation into
    * succeeded / retryable / skipped by error class (the reference's
    * `handle_api_error`, `etl/fetch_utils.py:235-258`: 429 → retry,
    * 404 → skip, and any OTHER error also retries — its else branch
    * returns should_retry=True). Statuses outside the known classes —
    * including NULL, which every three-valued-logic filter would
    * otherwise drop from all three slices — land in the retryable slice,
    * never silently vanish.
    * The bounded re-drive loop itself is driver control flow (see
    * [[fetchWithRetry]]) — kept out of the relational layer on purpose,
    * like the reference keeps it out of SQL.
    */
  def partitionByErrorClass(attempts: DataFrame, statusCol: String): (DataFrame, DataFrame, DataFrame) = (
    attempts.filter(col(statusCol) === "ok"),
    attempts.filter(col(statusCol).isNull || !col(statusCol).isin("ok", "not_found")),
    attempts.filter(col(statusCol) === "not_found"))

  /** B15 — bounded semantic retry: re-drive only the retryable slice, at most
    * `maxRetries` extra passes (reference default 3; the 60s sleep is an
    * external concern injected by the caller between passes).
    *
    * Each pass's attempt relation is pinned with `localCheckpoint` before the
    * status split: a live fetch source is nondeterministic, and without the
    * pin the lazily-kept `ok` lineage would re-execute every pass's fetch at
    * action time — retry decisions and the final output must come from ONE
    * evaluation. An empty request set returns an empty DataFrame with
    * `fetchOnce`'s schema (no passes run). A key still retryable when the
    * budget exhausts contributes NO rows — with per-record statuses its
    * partial ok rows are withheld each pass (the re-fetch re-delivers
    * them), so the result never double-counts a key's data.
    */
  def fetchWithRetry(
      requests: DataFrame,
      fetchOnce: DataFrame => DataFrame, // returns rows + statusCol
      statusCol: String,
      maxRetries: Int = 3,
      keyCols: Seq[String] = Seq("symbol")): DataFrame = {
    var ok: Option[DataFrame] = None
    var pending = requests
    var pass = 0
    while (pass <= maxRetries && !pending.isEmpty) {
      val attempt = fetchOnce(pending).localCheckpoint(true)
      val (succeeded, retryable, _) = partitionByErrorClass(attempt, statusCol)
      val retryKeys = retryable.select(keyCols.map(col): _*).distinct()
      // a key that is being RETRIED contributes nothing this pass — with
      // per-record statuses, a key can return ok rows AND a retryable row,
      // and the full re-fetch next pass would duplicate the ok rows
      val cleanOk = succeeded.join(retryKeys, keyCols, "left_anti")
      ok = Some(ok.fold(cleanOk)(_.unionByName(cleanOk)))
      pending = pending.join(retryKeys, keyCols, "left_semi")
      pass += 1
    }
    ok.getOrElse(fetchOnce(requests.limit(0)).limit(0))
  }

  /** §3.3 MARKET_INDEX_DATA_UPDATE_REQUEST: cache-first short-circuit →
    * batched fetch (join) → rename projection → single-key upsert →
    * completion; on a failed/empty fetch the cached rows are re-emitted
    * (stale-on-error fallback).
    */
  def indexUpdate(
      requests: DataFrame, // (symbol)
      store: DataFrame,    // index snapshot keyed (symbol)
      quotes: DataFrame,   // feed (symbol, regularMarketPrice, …)
      now: Column): JobResult = {
    if (Incremental.fullyCovered(requests, store, Seq("symbol"))) {
      // B9: everything cached — re-emit existing rows, no fetch
      val data = store.join(requests, Seq("symbol"), "left_semi")
      val completion = data
        .agg(count(lit(1)).as("record_count"), countDistinct(col("symbol")).as("total_symbols"))
        .withColumn("total_batches", lit(0L))
        .withColumn("status", lit("complete_cached"))
      JobResult(store, completion)
    } else {
      val fetched = Relational.renameProject(
        requests.join(quotes, Seq("symbol")),
        Seq(
          "symbol" -> "symbol",
          "regularMarketPrice" -> "price",
          "regularMarketChange" -> "price_change",
          "regularMarketChangePercent" -> "percent_change",
          "regularMarketDayHigh" -> "price_high",
          "regularMarketDayLow" -> "price_low"))
        .withColumn("updated_at", now)
        // pinned ONCE: a live quote source is nondeterministic, and both
        // outputs (store AND completion) must describe the SAME evaluation
        // — without this, a caller materializing them separately could see
        // a completion that doesn't count the rows actually upserted
        .localCheckpoint(true)
      // EXCLUDED-wins via source priority — updated_at can tie on retries
      val updated = Merge.upsert(
        store.withColumn("__src", lit(0)),
        fetched.withColumn("__src", lit(1)),
        Seq("symbol"), Seq(col("__src"), col("updated_at"))).drop("__src")
      val completion = fetched
        .agg(
          count(lit(1)).as("record_count"),
          ceil(count(lit(1)) / lit(100.0)).cast("long").as("total_batches"),
          countDistinct(col("symbol")).as("total_symbols"))
        .withColumn("status", lit("complete"))
      JobResult(updated, completion)
    }
  }
}
