package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.Jobs
import graft.ops.{Analytics, Merge, MultimodalOps}
import graft.streaming.Streaming

class JobsStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quote(sym: String, at: String, p: Double) =
    (sym, at, p, 1.0, 2.0, p + 1, p - 1)

  test("marketDataUpdate: only missing keys fetched; store upserted; completion counts") {
    val requests = Seq(("AAPL", "STOCK"), ("TSLA", "STOCK"), ("BTC", "CRYPTO"))
      .toDF("symbol", "asset_type")
    val store = Seq(("AAPL", "STOCK", 99.0, 0.0, 0.0, 99.0, 99.0, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("symbol", "asset_type", "price", "percent_change", "change", "high", "low", "updated_at")
    val quotes = Seq(quote("TSLA", "STOCK", 200.0), quote("BTC", "CRYPTO", 40000.0), quote("AAPL", "STOCK", 150.0))
      .toDF("symbol", "asset_type", "price", "percent_change", "change", "high", "low")
    val r = Jobs.marketDataUpdate(requests, store, quotes, lit("2024-02-01 00:00:00").cast("timestamp"))
    val prices = r.store.select("symbol", "price").as[(String, Double)].collect().toMap
    // AAPL was cached → NOT refetched (price stays 99); TSLA/BTC inserted
    assert(prices == Map("AAPL" -> 99.0, "TSLA" -> 200.0, "BTC" -> 40000.0))
    val c = r.completion.select("record_count", "total_batches", "total_assets", "status")
      .as[(Long, Long, Long, String)].head()
    assert(c == ((2L, 1L, 2L, "complete")))
  }

  test("historicalBackfill: fills only missing months, last value per month wins") {
    val requests = Seq(("AAPL", "STOCK")).toDF("symbol", "asset_type")
    val store = Seq(("AAPL", "STOCK", java.sql.Date.valueOf("2024-01-01"), 10.0))
      .toDF("symbol", "asset_type", "date", "price")
    val series = Seq(
      ("AAPL", "STOCK", Timestamp.valueOf("2024-01-20 00:00:00"), 11.0), // already covered month
      ("AAPL", "STOCK", Timestamp.valueOf("2024-02-10 00:00:00"), 12.0),
      ("AAPL", "STOCK", Timestamp.valueOf("2024-02-25 00:00:00"), 13.0), // later in Feb wins
      ("AAPL", "STOCK", Timestamp.valueOf("2024-03-05 00:00:00"), 14.0)
    ).toDF("symbol", "asset_type", "datetime", "close")
    val r = Jobs.historicalBackfill(
      requests, store, series,
      lit("2024-01-01").cast("date"), lit("2024-03-01").cast("date"))
    val rows = r.store.select("date", "price").as[(java.sql.Date, Double)].collect().toMap
      .map { case (d, p) => d.toString -> p }
    // Jan kept from store (10.0, not refetched-overwritten since gap excludes covered months...
    // actually Jan IS in the fetched span [Feb..Mar]? no: gap_start=Feb)
    assert(rows == Map("2024-01-01" -> 10.0, "2024-02-01" -> 13.0, "2024-03-01" -> 14.0))
  }

  test("historicalBackfill: non-contiguous gap — fresh fetch beats a higher stale store price") {
    val requests = Seq(("AAPL", "STOCK")).toDF("symbol", "asset_type")
    // store covers Jan and Mar; spine Jan..Apr → missing {Feb, Apr} coalesce
    // to the span [Feb, Apr], which CONTAINS the covered Mar. The stored Mar
    // price (99.0) is higher than the re-fetched one (14.0): EXCLUDED-wins
    // means the fresh 14.0 must replace it regardless of magnitude.
    val store = Seq(
      ("AAPL", "STOCK", java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("AAPL", "STOCK", java.sql.Date.valueOf("2024-03-01"), 99.0)
    ).toDF("symbol", "asset_type", "date", "price")
    val series = Seq(
      ("AAPL", "STOCK", Timestamp.valueOf("2024-02-10 00:00:00"), 12.0),
      ("AAPL", "STOCK", Timestamp.valueOf("2024-03-05 00:00:00"), 14.0),
      ("AAPL", "STOCK", Timestamp.valueOf("2024-04-02 00:00:00"), 16.0)
    ).toDF("symbol", "asset_type", "datetime", "close")
    val r = Jobs.historicalBackfill(
      requests, store, series,
      lit("2024-01-01").cast("date"), lit("2024-04-01").cast("date"))
    val rows = r.store.select("date", "price").as[(java.sql.Date, Double)].collect()
      .map { case (d, p) => d.toString -> p }.toMap
    assert(rows == Map(
      "2024-01-01" -> 10.0, // untouched (outside the gap span)
      "2024-02-01" -> 12.0,
      "2024-03-01" -> 14.0, // fresh fetch wins over stale 99.0
      "2024-04-01" -> 16.0))
  }

  test("historicalBackfill emits one completion payload per batch of requested symbols") {
    // 7 STOCK + 2 CRYPTO requests with batch size 50 → 1 batch each; the
    // per-batch record counts must tile the aggregate completion count and
    // 0-record symbols must still appear in their batch's symbol list
    val requests = ((1 to 7).map(i => (s"S$i", "STOCK")) ++ Seq(("C1", "CRYPTO"), ("C2", "CRYPTO")))
      .toDF("symbol", "asset_type")
    val store = Seq.empty[(String, String, java.sql.Date, Double)]
      .toDF("symbol", "asset_type", "date", "price")
    // S7 and C2 have no feed rows at all
    val series = ((1 to 6).flatMap(i => Seq(
      (s"S$i", "STOCK", Timestamp.valueOf("2024-01-10 00:00:00"), i * 1.0),
      (s"S$i", "STOCK", Timestamp.valueOf("2024-02-10 00:00:00"), i * 2.0))) ++
      Seq(("C1", "CRYPTO", Timestamp.valueOf("2024-01-15 00:00:00"), 9.0)))
      .toDF("symbol", "asset_type", "datetime", "close")
    val r = Jobs.historicalBackfill(
      requests, store, series,
      lit("2024-01-01").cast("date"), lit("2024-02-01").cast("date"))
    val pb = r.perBatch.get
      .select("asset_type", "batch_id", "symbols", "symbol_count", "record_count", "status")
      .as[(String, Long, Seq[String], Long, Long, String)].collect()
    assert(pb.length == 2) // one batch per asset type at this size
    val byType = pb.map(p => p._1 -> p).toMap
    assert(byType("STOCK")._3 == (1 to 7).map(i => s"S$i"))
    assert(byType("STOCK")._4 == 7L && byType("STOCK")._5 == 12L) // 6 symbols × 2 months
    assert(byType("CRYPTO")._3 == Seq("C1", "C2"))
    assert(byType("CRYPTO")._4 == 2L && byType("CRYPTO")._5 == 1L)
    assert(pb.forall(_._6 == "complete"))
    // per-batch record counts tile the aggregate completion exactly, and
    // total_batches reconciles with the number of per-batch payloads
    val (total, totalBatches) = r.completion
      .select("record_count", "total_batches").as[(Long, Long)].head()
    assert(pb.map(_._5).sum == total)
    assert(totalBatches == pb.length.toLong)
    // start/end dates ride along per payload, like the reference message
    val dates = r.perBatch.get.select("start_date", "end_date")
      .as[(java.sql.Date, java.sql.Date)].collect().toSet
    assert(dates == Set((java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-02-01"))))
    // A2 publish shape: one JSON message per batch on the completion topic
    val payloads = Streaming.completionPayload(r.perBatch.get, "historical_complete")
      .select("topic", "value").as[(String, String)].collect()
    assert(payloads.length == 2)
    assert(payloads.forall(_._1 == "historical_complete"))
    assert(payloads.forall(p =>
      p._2.contains("\"record_count\"") && p._2.contains("\"symbols\"") &&
        p._2.contains("\"status\":\"complete\"")))
    // jobs without a per-batch publish contract carry None
    assert(Jobs.marketDataUpdate(
      Seq(("AAPL", "STOCK")).toDF("symbol", "asset_type"),
      Seq.empty[(String, String, Double, Double, Double, Double, Double, Timestamp)]
        .toDF("symbol", "asset_type", "price", "percent_change", "change", "high", "low", "updated_at"),
      Seq(quote("AAPL", "STOCK", 1.0))
        .toDF("symbol", "asset_type", "price", "percent_change", "change", "high", "low"),
      current_timestamp()).perBatch.isEmpty)
  }

  test("fetchWithRetry: empty request set returns an empty frame with fetchOnce's schema") {
    val requests = Seq.empty[String].toDF("symbol")
    var calls = 0
    def fetchOnce(req: DataFrame): DataFrame = {
      calls += 1
      req.withColumn("status", lit("ok")).withColumn("price", lit(1.0))
    }
    val out = Jobs.fetchWithRetry(requests, fetchOnce, "status")
    assert(out.columns.toSeq == Seq("symbol", "status", "price"))
    assert(out.count() == 0)
  }

  test("indexUpdate: cache-first short-circuit when fully covered") {
    val requests = Seq("^GSPC").toDF("symbol")
    val store = Seq(("^GSPC", 5000.0)).toDF("symbol", "price")
    val quotes = spark.emptyDataFrame
    val r = Jobs.indexUpdate(requests, store, quotes, current_timestamp())
    assert(r.completion.select("status").as[String].head() == "complete_cached")
    assert(r.store.count() == 1)
  }

  test("streaming dedup within watermark drops re-delivered fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val df = stream.toDF().toDF("fingerprint", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .select("fingerprint", "ts")
    val deduped = Streaming.dedupWithinWatermark(df, "ts", Seq("fingerprint"), "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    stream.addData(("doc_a", "2024-01-01 00:00:00"), ("doc_b", "2024-01-01 00:01:00"))
    q.processAllAvailable()
    // re-delivery of doc_a within the horizon + a fresh doc
    stream.addData(("doc_a", "2024-01-01 00:02:00"), ("doc_c", "2024-01-01 00:03:00"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("fingerprint").as[String].collect().toSeq
    assert(got.sorted == Seq("doc_a", "doc_b", "doc_c"))
  }

  test("RocksDB-backed dedupWithinWatermark: crash/restart equivalence + provider state metrics") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val df = stream.toDF().toDF("fingerprint", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .select("fingerprint", "ts")
    val deduped = Streaming.dedupWithinWatermark(df, "ts", Seq("fingerprint"), "10 minutes")
    val ckpt = Files.createTempDirectory("graft-rocks-ckpt").toString
    // foreachBatch sink: the memory sink refuses checkpoint recovery, and
    // recovery is exactly what this test exercises
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def startQuery() = Streaming.withRocksDbStateStore(spark) {
      deduped.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("fingerprint").collect().foreach(r => emitted.add(r.getString(0)))
        }
        .start()
    }
    val q1 = startQuery()
    stream.addData(
      ("doc_a", "2024-01-01 00:00:00"), ("doc_b", "2024-01-01 00:01:00"),
      ("doc_a", "2024-01-01 00:00:30")) // in-batch re-delivery
    q1.processAllAvailable()
    // the provider actually in use must be RocksDB: its custom metrics are
    // namespaced rocksdb* in the progress events
    val metrics1 = q1.lastProgress.stateOperators.head.customMetrics
    import scala.jdk.CollectionConverters._
    assert(metrics1.keySet.asScala.exists(_.startsWith("rocksdb")),
      s"expected rocksdb provider metrics, got ${metrics1.keySet}")
    q1.stop()
    // crash analog: a FRESH query restarts from the checkpoint — dedup state
    // must come back from the RocksDB snapshot, so a cross-restart
    // re-delivery of doc_a/doc_b within the horizon still drops
    val q2 = startQuery()
    stream.addData(
      ("doc_a", "2024-01-01 00:02:00"), ("doc_b", "2024-01-01 00:03:00"),
      ("doc_c", "2024-01-01 00:04:00"))
    q2.processAllAvailable()
    val prog = q2.lastProgress.stateOperators.head
    // state-size assertion: exactly the distinct keys within the horizon are
    // held (3 fingerprints), none evicted yet, none duplicated by the restart
    assert(prog.numRowsTotal == 3L, s"state rows = ${prog.numRowsTotal}")
    assert(prog.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")))
    q2.stop()
    val got = emitted.toArray(new Array[String](0)).toSeq
    assert(got.sorted == Seq("doc_a", "doc_b", "doc_c"),
      s"restart must not re-emit keys already deduped before the crash, got $got")
  }

  test("indexUpdate stale-on-error fallback serves cached rows with degraded status") {
    val requests = Seq("^GSPC", "^NDX").toDF("symbol")
    val store = Seq(("^GSPC", 5000.0)).toDF("symbol", "price")
    val r = graft.jobs.Jobs.indexUpdateWithFallback(
      requests, store,
      () => throw new RuntimeException("simulated API outage"),
      current_timestamp())
    assert(r.completion.select("status").as[String].head() == "stale_fallback")
    assert(r.completion.select("record_count").as[Long].head() == 1L) // only ^GSPC cached
    assert(r.store.collect().toSeq.nonEmpty)
  }

  test("driver smoke contract: entry() returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("streaming snapshot merge equals batch merge over the same ticks (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = Seq(
      (1L, "STOCK", 10.0, 1L), (1L, "STOCK", 11.0, 3L),
      (2L, "CRYPTO", 5.0, 1L), (1L, "STOCK", 9.0, 2L))
    val stream = MemoryStream[(Long, String, Double, Long)]
    val df = stream.toDF().toDF("symbol", "asset_type", "price", "v")
    val snap = new Streaming.SnapshotStream(Seq("symbol", "asset_type"), Seq("v"))
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = snap.start(df, ckpt)
    stream.addData(ticks.take(2)); q.processAllAvailable()
    stream.addData(ticks.drop(2)); q.processAllAvailable()
    q.stop()
    val streamed = snap.current.get.select("symbol", "price").as[(Long, Double)].collect().toSet
    val batch = Merge.lastWins(
      ticks.toDF("symbol", "asset_type", "price", "v"),
      Seq("symbol", "asset_type"), Seq(col("v")))
      .select("symbol", "price").as[(Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 11.0), (2L, 5.0)))
  }

  test("SnapshotStream: kill and restart from checkpoint + persisted store equals single-run merge") {
    implicit val sqlCtx = spark.sqlContext
    val ticks1 = Seq((1L, "STOCK", 10.0, 1L), (2L, "CRYPTO", 5.0, 1L))
    val ticks2 = Seq((1L, "STOCK", 11.0, 3L), (1L, "STOCK", 9.0, 2L), (3L, "STOCK", 7.0, 1L))
    val stream = MemoryStream[(Long, String, Double, Long)]
    val df = stream.toDF().toDF("symbol", "asset_type", "price", "v")
    val ckpt = Files.createTempDirectory("graft-snap-ckpt").toString
    val store = Files.createTempDirectory("graft-snap-store").toString + "/snap"
    val snap1 = new Streaming.SnapshotStream(Seq("symbol", "asset_type"), Seq("v"), Some(store))
    val q1 = snap1.start(df, ckpt)
    stream.addData(ticks1); q1.processAllAvailable(); q1.stop()
    // a FRESH instance — driver state gone, the crash analog — restarts
    // from the same checkpoint dir and the persisted store
    val snap2 = new Streaming.SnapshotStream(Seq("symbol", "asset_type"), Seq("v"), Some(store))
    val q2 = snap2.start(df, ckpt)
    stream.addData(ticks2); q2.processAllAvailable(); q2.stop()
    val streamed = snap2.current.get
      .select("symbol", "price").as[(Long, Double)].collect().toSet
    val batch = Merge.lastWins(
      (ticks1 ++ ticks2).toDF("symbol", "asset_type", "price", "v"),
      Seq("symbol", "asset_type"), Seq(col("v")))
      .select("symbol", "price").as[(Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 11.0), (2L, 5.0), (3L, 7.0)))
  }

  test("RollupStream: kill and restart rebuilds the rollup from per-batch partials exactly") {
    implicit val sqlCtx = spark.sqlContext
    val t1 = Seq((1L, 10.5), (2L, 3.25), (1L, 2.75))
    val t2 = Seq((1L, 1.0), (3L, 7.5), (2L, 0.25))
    val t3 = Seq((3L, 2.5), (4L, 6.0)) // steady-state batch after the restart rebuild
    val stream = MemoryStream[(Long, Double)]
    val df = stream.toDF().toDF("k", "v")
    val ckpt = Files.createTempDirectory("graft-roll-ckpt").toString
    val store = Files.createTempDirectory("graft-roll-store").toString + "/roll"
    val roll1 = new Streaming.RollupStream(Seq("k"), "v", Some(store))
    val q1 = roll1.start(df, ckpt)
    stream.addData(t1); q1.processAllAvailable(); q1.stop()
    val roll2 = new Streaming.RollupStream(Seq("k"), "v", Some(store))
    val q2 = roll2.start(df, ckpt)
    stream.addData(t2); q2.processAllAvailable() // first batch: disk rebuild
    stream.addData(t3); q2.processAllAvailable() // later batch: O(keys) monoid merge
    q2.stop()
    val streamed = roll2.current.get
      .select(col("k"), col("n"), col("__total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.ops.Analytics.partialAgg(
      (t1 ++ t2 ++ t3).toDF("k", "v"), Seq("k"), "v")
      .select(col("k"), col("n"), col("__total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 3L, 14.25), (2L, 2L, 3.5), (3L, 2L, 10.0), (4L, 1L, 6.0)))
    // between-runs compaction folds the three slots into one base slot and
    // a further restart + new batch still yields the exact rollup
    assert(roll2.compact(spark) == 3)
    val roll3 = new Streaming.RollupStream(Seq("k"), "v", Some(store))
    val q3 = roll3.start(df, ckpt)
    stream.addData(Seq((1L, 0.5))); q3.processAllAvailable(); q3.stop()
    val afterCompact = roll3.current.get
      .select(col("k"), col("n"), col("__total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(afterCompact == Set(
      (1L, 4L, 14.75), (2L, 2L, 3.5), (3L, 2L, 10.0), (4L, 1L, 6.0)))
  }

  test("CdcCarrierStream: maintained carriers equal one-shot across kill/restart/compaction; marks match the batch dedup") {
    implicit val sqlCtx = spark.sqlContext
    val shared = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm windowsill and the birds sing in the garden " +
      "all through the long summer afternoon hours"
    val t1 = Seq((1L, "alpha soup one " + shared), (2L, "totally unrelated text here"))
    val t2 = Seq((3L, "beta prefix words " + shared))
    val t3 = Seq((4L, "gamma " + shared))
    val stream = MemoryStream[(Long, String)]
    val df = stream.toDF().toDF("doc_id", "text")
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val store = Files.createTempDirectory("graft-cdc-store").toString + "/cdc"
    val s1 = new Streaming.CdcCarrierStream("doc_id", "text", storeDir = Some(store))
    val q1 = s1.start(df, ckpt)
    stream.addData(t1); q1.processAllAvailable(); q1.stop()
    val s2 = new Streaming.CdcCarrierStream("doc_id", "text", storeDir = Some(store))
    val q2 = s2.start(df, ckpt)
    stream.addData(t2); q2.processAllAvailable() // first batch: disk rebuild
    stream.addData(t3); q2.processAllAvailable() // steady state: O(chunks) fold
    q2.stop()
    val allDocs = (t1 ++ t2 ++ t3).toDF("doc_id", "text")
    def carriers(d: org.apache.spark.sql.DataFrame) =
      d.select(col("chunk_id"), col("n_carriers")).as[(Long, Long)].collect().toSet
    val oneShot = graft.ops.DedupOps.cdcCarrierStats(
      graft.ops.DedupOps.cdcChunks(allDocs, "doc_id", "text"), "doc_id")
    assert(carriers(s2.current.get) == carriers(oneShot),
      "maintained carriers must equal the one-shot relation")
    // marking a batch's chunks against the store equals the batch dedup
    val chunks = graft.ops.DedupOps.cdcChunks(allDocs, "doc_id", "text")
    val viaStream = s2.mark(chunks).get
    val viaBatch = graft.ops.DedupOps.cdcChunkDedup(allDocs, "doc_id", "text")
    assert(viaStream.exceptAll(viaBatch).isEmpty && viaBatch.exceptAll(viaStream).isEmpty)
    // the shared passage's interior chunks are multi-carrier; doc 2 is not
    val marked = viaStream.select(col("doc_id"), col("is_dup"))
      .as[(Long, Boolean)].collect()
    assert(marked.exists(r => r._1 == 3L && r._2), "resynced chunks carry across docs")
    assert(marked.filter(_._1 == 2L).forall(!_._2), "unrelated doc stays unique")
    // compaction + restart stays exact
    assert(s2.compact(spark) == 3)
    val s3 = new Streaming.CdcCarrierStream("doc_id", "text", storeDir = Some(store))
    val q3 = s3.start(df, ckpt)
    stream.addData(Seq((5L, "delta " + shared))); q3.processAllAvailable(); q3.stop()
    val after = graft.ops.DedupOps.cdcCarrierStats(
      graft.ops.DedupOps.cdcChunks(
        (t1 ++ t2 ++ t3 ++ Seq((5L, "delta " + shared))).toDF("doc_id", "text"),
        "doc_id", "text"), "doc_id")
    assert(carriers(s3.current.get) == carriers(after))
  }

  test("DomainStatsStream: maintained stats equal one-shot across kill/restart/compaction; verdicts match the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    // texts engineered so quality differs by domain: d1 clean prose (high
    // stopword/low punct), d2 punctuation junk (gate-failing), d3 one doc
    val clean = "the cat and the dog sat on the mat with all of the others in a big room"
    val junk = "xxx !!! ;;; ??? ::: ... yyy !!! ;;; ??? ::: ... zzz !!! ;;; ??? ::: ..."
    val t1 = Seq(("d1.com", clean), ("d2.com", junk), ("d1.com", clean))
    val t2 = Seq(("d2.com", junk), ("d1.com", clean), ("d2.com", junk))
    val t3 = Seq(("d3.com", clean)) // steady-state batch after restart rebuild
    val stream = MemoryStream[(String, String)]
    val df = stream.toDF().toDF("domain", "text")
    val ckpt = Files.createTempDirectory("graft-dom-ckpt").toString
    val store = Files.createTempDirectory("graft-dom-store").toString + "/dom"
    val s1 = new Streaming.DomainStatsStream("domain", "text", Some(store))
    val q1 = s1.start(df, ckpt)
    stream.addData(t1); q1.processAllAvailable(); q1.stop()
    val s2 = new Streaming.DomainStatsStream("domain", "text", Some(store))
    val q2 = s2.start(df, ckpt)
    stream.addData(t2); q2.processAllAvailable() // first batch: disk rebuild
    stream.addData(t3); q2.processAllAvailable() // later batch: O(domains) fold
    q2.stop()
    def st(d: org.apache.spark.sql.DataFrame) =
      d.select(col("domain"), col("n_docs"), col("sum_q_fp"))
        .as[(String, Long, Long)].collect().toSet
    val oneShot = graft.ops.TextOps.domainStats(
      (t1 ++ t2 ++ t3).toDF("domain", "text"), "domain", "text")
    assert(st(s2.current.get) == st(oneShot),
      "maintained stats must equal the one-shot relation")
    // the derived gate is the batch derivation verbatim
    val vStream = s2.verdicts().get
      .select(col("domain"), col("domain_ok")).as[(String, Boolean)].collect().toMap
    val vBatch = graft.ops.TextOps.domainVerdicts(oneShot)
      .select(col("domain"), col("domain_ok")).as[(String, Boolean)].collect().toMap
    assert(vStream == vBatch)
    assert(vStream == Map("d1.com" -> true, "d2.com" -> false, "d3.com" -> false),
      "clean domain passes, junk domain fails quality, single-doc domain fails evidence")
    // compaction folds the slots; a further restart + new batch stays exact
    assert(s2.compact(spark) == 3)
    val s3 = new Streaming.DomainStatsStream("domain", "text", Some(store))
    val q3 = s3.start(df, ckpt)
    stream.addData(Seq(("d3.com", clean), ("d3.com", clean))); q3.processAllAvailable(); q3.stop()
    val after = s3.verdicts().get
      .select(col("domain"), col("n_docs"), col("domain_ok"))
      .as[(String, Long, Boolean)].collect().toSet
    assert(after.contains(("d3.com", 3L, true)),
      "d3 crosses the evidence bar after the post-compaction batch")
  }

  test("HllStream: maintained registers equal the one-shot file across kill/restart/compaction; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val t1 = Seq(("click", 1L), ("click", 2L), ("view", 1L))
    val t2 = Seq(("click", 3L), ("view", 2L), ("view", 2L)) // intra-batch dup
    val t3 = Seq(("click", 1L), ("view", 9L)) // cross-batch re-sighting
    val stream = MemoryStream[(String, Long)]
    val df = stream.toDF().toDF("event_type", "user_id")
    val ckpt = Files.createTempDirectory("graft-hll-ckpt").toString
    val store = Files.createTempDirectory("graft-hll-store").toString + "/hll"
    val s1 = new Streaming.HllStream(Seq("event_type"), "user_id", storeDir = Some(store))
    val q1 = s1.start(df, ckpt)
    stream.addData(t1); q1.processAllAvailable(); q1.stop()
    val s2 = new Streaming.HllStream(Seq("event_type"), "user_id", storeDir = Some(store))
    val q2 = s2.start(df, ckpt)
    stream.addData(t2); q2.processAllAvailable() // first batch: disk rebuild
    stream.addData(t3); q2.processAllAvailable() // steady state: O(keys·m) merge
    q2.stop()
    def regs(d: org.apache.spark.sql.DataFrame) =
      d.select(col("event_type"), col("reg"), col("mx"))
        .as[(String, Long, Long)].collect().toSet
    val oneShot = graft.ops.Analytics.hllRegisters(
      (t1 ++ t2 ++ t3).toDF("event_type", "user_id"), Seq("event_type"), "user_id")
    assert(regs(s2.current.get) == regs(oneShot),
      "maintained registers must equal the one-shot register file")
    // the derived estimates agree too (same registers, same formula)
    val estStream = s2.estimate.get.as[(String, Double)].collect().toMap
    val estBatch = graft.ops.Analytics.hllEstimate(oneShot, Seq("event_type"))
      .as[(String, Double)].collect().toMap
    assert(estStream == estBatch)
    // compaction folds the slots; a further restart + re-DELIVERED data is
    // a register no-op (max is idempotent — stronger than the rollup's sums)
    assert(s2.compact(spark) == 3)
    val s3 = new Streaming.HllStream(Seq("event_type"), "user_id", storeDir = Some(store))
    val q3 = s3.start(df, ckpt)
    stream.addData(t1 ++ t2 ++ t3); q3.processAllAvailable(); q3.stop()
    assert(regs(s3.current.get) == regs(oneShot),
      "re-delivering every row ever seen must leave the registers unchanged")
  }

  test("KmvStream: maintained sketch equals the one-shot sketch across kill/restart/compaction; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val t1 = Seq(("click", 1L), ("click", 2L), ("view", 1L))
    val t2 = Seq(("click", 3L), ("view", 2L), ("view", 2L)) // intra-batch dup
    val t3 = Seq(("click", 1L), ("view", 9L)) // cross-batch re-sighting
    val stream = MemoryStream[(String, Long)]
    val df = stream.toDF().toDF("event_type", "user_id")
    val ckpt = Files.createTempDirectory("graft-kmv-ckpt").toString
    val store = Files.createTempDirectory("graft-kmv-store").toString + "/kmv"
    val s1 = new Streaming.KmvStream(Seq("event_type"), "user_id", k = 4, storeDir = Some(store))
    val q1 = s1.start(df, ckpt)
    stream.addData(t1); q1.processAllAvailable(); q1.stop()
    val s2 = new Streaming.KmvStream(Seq("event_type"), "user_id", k = 4, storeDir = Some(store))
    val q2 = s2.start(df, ckpt)
    stream.addData(t2); q2.processAllAvailable() // first batch: disk rebuild
    stream.addData(t3); q2.processAllAvailable() // steady state: O(keys·k) merge
    q2.stop()
    def sk(d: org.apache.spark.sql.DataFrame) =
      d.select(col("event_type"), col("hv"), col("pos"))
        .as[(String, Long, Long)].collect().toSet
    val oneShot = graft.ops.Analytics.kmvSketch(
      (t1 ++ t2 ++ t3).toDF("event_type", "user_id"), Seq("event_type"), "user_id", k = 4)
    assert(sk(s2.current.get) == sk(oneShot),
      "maintained sketch must equal the one-shot sketch relation")
    // k=4 < 4 distinct click users? click has {1,2,3} = 3 < 4 -> exact path;
    // view has {1,2,9} = 3 -> exact path; estimates equal the batch form
    val estStream = s2.estimate.get
      .select(col("event_type"), col("n_sketch"), col("est_distinct"))
      .as[(String, Long, Double)].collect().toSet
    val estBatch = graft.ops.Analytics.kmvEstimate(oneShot, Seq("event_type"), k = 4)
      .select(col("event_type"), col("n_sketch"), col("est_distinct"))
      .as[(String, Long, Double)].collect().toSet
    assert(estStream == estBatch)
    assert(estStream.map(e => e._1 -> e._3).toMap == Map("click" -> 3.0, "view" -> 3.0))
    // compaction folds the slots; a further restart + re-DELIVERED data is
    // a sketch no-op (min-k of a distinct union is replay-insensitive)
    assert(s2.compact(spark) == 3)
    val s3 = new Streaming.KmvStream(Seq("event_type"), "user_id", k = 4, storeDir = Some(store))
    val q3 = s3.start(df, ckpt)
    stream.addData(t1 ++ t2 ++ t3); q3.processAllAvailable(); q3.stop()
    assert(sk(s3.current.get) == sk(oneShot),
      "re-delivering every row ever seen must leave the sketch unchanged")
  }

  test("SnapshotStream recovery fences a crashed version write and resumes from the last good one") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft-snapv").toString + "/snap"
    Seq((1L, "STOCK", 42.0, 1L)).toDF("symbol", "asset_type", "price", "v")
      .write.parquet(s"$store/v=3")
    // a crashed overwrite: newer version dir with data but NO _SUCCESS —
    // must be fenced off, never read, never shadow v=3
    Seq((9L, "JUNK", 0.0, 9L)).toDF("symbol", "asset_type", "price", "v")
      .write.parquet(s"$store/v=5")
    assert(new java.io.File(s"$store/v=5/_SUCCESS").delete())
    val stream = MemoryStream[(Long, String, Double, Long)]
    val df = stream.toDF().toDF("symbol", "asset_type", "price", "v")
    val snap = new Streaming.SnapshotStream(Seq("symbol", "asset_type"), Seq("v"), Some(store))
    val q = snap.start(df, Files.createTempDirectory("graft-snapv-ckpt").toString)
    stream.addData(Seq((2L, "CRYPTO", 5.0, 1L))); q.processAllAvailable(); q.stop()
    val got = snap.current.get.select("symbol", "price").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 42.0), (2L, 5.0))) // junk from the crashed write is gone
    // exactly one committed version remains on disk
    val dirs = new java.io.File(store).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.size == 1 && dirs.forall(_.startsWith("v=")))
  }

  test("SnapshotStream recovery promotes a committed staged version (crash between delete and rename)") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft-snapp").toString + "/snap"
    // the worst crash window: the old version was already deleted and the
    // new one fully staged (committed) but not yet renamed into place —
    // recovery must finish the promotion, not lose the store
    Seq((1L, "STOCK", 42.0, 7L)).toDF("symbol", "asset_type", "price", "v")
      .write.parquet(s"$store/.v-7")
    val stream = MemoryStream[(Long, String, Double, Long)]
    val df = stream.toDF().toDF("symbol", "asset_type", "price", "v")
    val snap = new Streaming.SnapshotStream(Seq("symbol", "asset_type"), Seq("v"), Some(store))
    val q = snap.start(df, Files.createTempDirectory("graft-snapp-ckpt").toString)
    stream.addData(Seq((2L, "CRYPTO", 5.0, 1L))); q.processAllAvailable(); q.stop()
    val got = snap.current.get.select("symbol", "price").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 42.0), (2L, 5.0)))
  }

  test("RollupStream start completes an interrupted compaction without double-counting") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft-rollc").toString + "/roll"
    val p0 = graft.ops.Analytics.partialAgg(Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v"), Seq("k"), "v")
    p0.write.parquet(s"$store/batch_id=0")
    val p1 = graft.ops.Analytics.partialAgg(Seq((1L, 1.0)).toDF("k", "v"), Seq("k"), "v")
    p1.write.parquet(s"$store/batch_id=1")
    // a committed staging dir whose compaction crashed BEFORE deleting the
    // folded slots: recovery must finish the job (delete 0 and 1, rename
    // the staging fold into place) — merging staging + slots would double
    graft.ops.Analytics.mergePartialAggs(Seq(p0, p1), Seq("k"))
      .write.parquet(s"$store/.compact--1")
    val stream = MemoryStream[(Long, Double)]
    val df = stream.toDF().toDF("k", "v")
    val roll = new Streaming.RollupStream(Seq("k"), "v", Some(store))
    val q = roll.start(df, Files.createTempDirectory("graft-rollc-ckpt").toString)
    stream.addData(Seq((3L, 7.0))); q.processAllAvailable(); q.stop()
    val got = roll.current.get.select(col("k"), col("n"), col("__total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 3.0), (2L, 1L, 3.0), (3L, 1L, 7.0)))
    // the folded slots 0/1 were deleted and the staging dir renamed into
    // the base; the NEW batch (fresh checkpoint → epoch base 0 over the
    // negative-id-only store) wrote its own slot. Dot-prefixed protocol
    // dirs (.ck_epoch) are reader-invisible and not part of the contract.
    val dirs = new java.io.File(store).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(dirs == Set("batch_id=-1", "batch_id=0"))
  }

  test("streaming corpus ingestion: quality gate + store dedup equals the batch curation") {
    // the curation ops composed onto a document stream: per micro-batch,
    // gate by token count, drop content already ingested (digest anti-join
    // against the store), first-arrival-wins within the batch, append.
    // Re-deliveries and cross-batch exact dupes must collapse exactly as
    // the batch pipeline over all arrivals would.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "x")) // 1 token — quality-gated out
    val b2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (4L, "a completely different document about spark engines"),
      (1L, "the quick brown fox jumps over the lazy dog")) // re-delivery
    val stream = MemoryStream[(Long, String)]
    val df = stream.toDF().toDF("doc_id", "text")
    @volatile var store = Seq.empty[(Long, String, String)].toDF("doc_id", "digest", "text")
    val ckpt = Files.createTempDirectory("graft-curate-ckpt").toString
    val q = df.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val gated = batch
          .filter(size(graft.ops.TextOps.tokens(col("text"))) >= 3)
          .withColumn("digest", md5(col("text")))
        val fresh = Streaming.dedupAgainstStore(gated, store, Seq("digest"))
        val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
        val kept = fresh.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        store = store.unionByName(kept.select("doc_id", "digest", "text")).localCheckpoint(true)
      }
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    val streamedIds = store.select("doc_id").as[Long].collect().toSet
    // batch curation over all arrivals: gate, then min-id keeper per digest
    val all = (b1 ++ b2).toDF("doc_id", "text").distinct()
      .filter(size(graft.ops.TextOps.tokens(col("text"))) >= 3)
    val batchKeepers = graft.ops.DedupOps.exactDedup(all, "doc_id", "text")
      .select(col("keeper_id").as("doc_id")).as[Long].collect().toSet
    assert(streamedIds == batchKeepers)
    assert(streamedIds == Set(1L, 4L))
  }

  test("streaming request→route→job→completion end-to-end; malformed payloads quarantined") {
    // the full reference loop (A1 decode → B19 route → §3.1 job → A2
    // publish) driven through one MemoryStream, including a malformed and
    // an empty request: both must be survived, neither must reach the job
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Relational
    val quotes = Seq(
      ("AAPL", "STOCK", 101.0, 0.5, 0.5, 102.0, 100.0),
      ("BTC", "CRYPTO", 50000.0, 1.0, 490.0, 50500.0, 49000.0))
      .toDF("symbol", "asset_type", "price", "percent_change", "change", "high", "low")
    val store0 = quotes.limit(0).withColumn("updated_at", lit(null).cast("timestamp"))
    var completions = Seq.empty[(Long, String)]
    var rejected = 0L
    var store = store0
    val stream = MemoryStream[(String, String)]
    val decoded = Streaming.decodeRequests(stream.toDF().toDF("topic", "value"))
    val routed = Streaming.routeTopics(decoded, Seq("MARKET_DATA_UPDATE_REQUEST" -> "market_data"))
    val q = routed.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val parsed = Relational.parsePayload(
          batch.filter(col("job") === "market_data"), "value_str",
          "assets ARRAY<STRUCT<symbol: STRING, asset_type: STRING>>")
        // PERMISSIVE from_json yields an all-null struct for garbage, so
        // the shape guard is on the required key (B6), not the struct
        rejected += parsed.filter(col("payload.assets").isNull).count()
        val requests = parsed.filter(col("payload.assets").isNotNull)
          .select(explode(col("payload.assets")).as("a"))
          .select(col("a.symbol").as("symbol"), col("a.asset_type").as("asset_type"))
          .filter(col("symbol").isNotNull && col("asset_type").isNotNull)
          .distinct()
        if (!requests.isEmpty) {
          val r = Jobs.marketDataUpdate(requests, store, quotes, current_timestamp())
          store = r.store.localCheckpoint(true)
          completions ++= Streaming.completionPayload(r.completion, "MARKET_DATA_COMPLETE")
            .select(col("value")).as[String].collect()
            .map(v => (1L, v))
        }
      }.start()
    stream.addData(
      ("MARKET_DATA_UPDATE_REQUEST", """{"assets":[{"symbol":"AAPL","asset_type":"STOCK"}]}"""),
      ("MARKET_DATA_UPDATE_REQUEST", "not json at all"),
      ("MARKET_DATA_UPDATE_REQUEST", "   "),
      ("SOME_OTHER_TOPIC", """{"assets":[{"symbol":"IGNORED","asset_type":"STOCK"}]}"""))
    q.processAllAvailable()
    stream.addData(
      ("MARKET_DATA_UPDATE_REQUEST", """{"assets":[{"symbol":"BTC","asset_type":"CRYPTO"}]}"""))
    q.processAllAvailable()
    q.stop()
    assert(rejected == 1L) // the non-JSON payload (empty value dropped at decode)
    assert(completions.size == 2)
    assert(completions.forall(_._2.contains("\"record_count\":1")))
    val finalStore = store.select("symbol", "price").as[(String, Double)].collect().toMap
    assert(finalStore == Map("AAPL" -> 101.0, "BTC" -> 50000.0))
  }

  test("stream-static dedup screens incoming docs against the stored fingerprint set") {
    implicit val sqlCtx = spark.sqlContext
    val store = Seq("fp_a", "fp_b").toDF("fingerprint")
    val stream = MemoryStream[(Long, String)]
    val incoming = stream.toDF().toDF("doc_id", "fingerprint")
    val novel = Streaming.dedupAgainstStore(incoming, store, Seq("fingerprint"))
    val q = novel.writeStream.format("memory").queryName("novel_out").outputMode("append").start()
    stream.addData((1L, "fp_a"), (2L, "fp_new")); q.processAllAvailable()
    stream.addData((3L, "fp_b"), (4L, "fp_other")); q.processAllAvailable()
    q.stop()
    val got = spark.table("novel_out").select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L, 4L)) // stored fingerprints screened out
  }

  test("stream-stream interval join equals the batch range join (click→purchase attribution)") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val clicks = Seq((1L, ts(0), "c1"), (1L, ts(20), "c2"), (2L, ts(5), "c3"))
    val purchases = Seq(
      (1L, ts(8), "p1"),   // within 10m of c1
      (1L, ts(25), "p2"),  // within 10m of c2 only
      (2L, ts(30), "p3"))  // no click within horizon
    val cs = MemoryStream[(Long, Timestamp, String)]
    val ps = MemoryStream[(Long, Timestamp, String)]
    val joined = Streaming.intervalJoin(
      cs.toDF().toDF("user_id", "ts", "click_id"),
      ps.toDF().toDF("user_id", "ts", "purchase_id"),
      "user_id", "ts", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    cs.addData(clicks.take(2)); ps.addData(purchases.take(1)); q.processAllAvailable()
    cs.addData(clicks.drop(2)); ps.addData(purchases.drop(1)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_out")
      .select("l_click_id", "r_purchase_id").as[(String, String)].collect().toSet
    val batch = Streaming.intervalJoin(
      clicks.toDF("user_id", "ts", "click_id"),
      purchases.toDF("user_id", "ts", "purchase_id"),
      "user_id", "ts", "10 minutes")
      .select("l_click_id", "r_purchase_id").as[(String, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(("c1", "p1"), ("c2", "p2")))
  }

  test("streaming rollup maintenance equals the batch aggregate over all batches") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = Seq(
      (1L, 10.5, 0), (2L, 3.25, 0), (1L, 2.75, 0),
      (1L, 1.0, 1), (3L, 7.5, 1), (2L, 0.25, 1))
    val stream = MemoryStream[(Long, Double, Int)]
    val df = stream.toDF().toDF("k", "v", "b")
    val roll = new Streaming.RollupStream(Seq("k"), "v")
    val ckpt = Files.createTempDirectory("graft-roll").toString
    val q = roll.start(df, ckpt)
    stream.addData(ticks.filter(_._3 == 0)); q.processAllAvailable()
    stream.addData(ticks.filter(_._3 == 1)); q.processAllAvailable()
    q.stop()
    val streamed = roll.current.get
      .select(col("k"), col("n"), col("__total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.ops.Analytics.partialAgg(
      ticks.toDF("k", "v", "b"), Seq("k"), "v")
      .select(col("k"), col("n"), col("__total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 3L, 14.25), (2L, 2L, 3.5), (3L, 1L, 7.5)))
  }

  test("stateless curation ops compose onto a stream unchanged (piiScrub + repetition)") {
    // the map-only text operators (scrub, repetition metrics' projection
    // half, lang-id, quality) are stateless Catalyst expressions, so the
    // SAME operator object runs on a readStream frame with no code change —
    // the streaming form of the curation pipeline is composition, not a port
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "mail me at a@b.com and x@y.org"),
      (2L, "call 555-123-4567 now"),
      (3L, "clean text with no pii at all"))
    val stream = MemoryStream[(Long, String)]
    val scrubbed = graft.ops.TextOps.piiScrub(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = scrubbed.writeStream.format("memory")
      .queryName("pii_stream").outputMode("append").start()
    stream.addData(docs.take(1)); q.processAllAvailable()
    stream.addData(docs.drop(1)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pii_stream")
      .select("doc_id", "n_emails", "n_phones", "scrub_sig")
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = graft.ops.TextOps.piiScrub(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_emails", "n_phones", "scrub_sig")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.exists { case (id, e, p, _) => id == 1L && e == 2L && p == 0L })
  }

  test("flatMapGroupsWithState keeps newest tick per key with update counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming.{Tick, Snapshot}
    val stream = MemoryStream[Tick]
    val out = Streaming.statefulLatest(stream.toDS())
    val q = out.writeStream.outputMode("append").format("memory").queryName("state_out").start()
    stream.addData(Tick("AAPL", "STOCK", 100.0, 1L), Tick("AAPL", "STOCK", 102.0, 2L))
    q.processAllAvailable()
    stream.addData(Tick("AAPL", "STOCK", 101.0, 1L)) // stale re-delivery: must NOT win
    q.processAllAvailable()
    stream.addData(Tick("AAPL", "STOCK", 110.0, 5L), Tick("BTC", "CRYPTO", 7.0, 1L))
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table("state_out").as[Snapshot].collect()
      .groupBy(s => (s.symbol, s.n_updates)).view.mapValues(_.head.price).toMap
    // n_updates counts FRESH ticks applied, not micro-batches: the stale
    // re-delivery in batch 2 leaves the counter at 2
    assert(snaps(("AAPL", 2L)) == 102.0) // batches 1-2: two fresh ticks, stale ignored
    assert(!snaps.contains(("AAPL", 1L)))
    assert(snaps(("AAPL", 3L)) == 110.0) // batch 3: one more fresh tick
    assert(snaps(("BTC", 1L)) == 7.0)
  }

  test("statefulEwma: streamed trajectory bit-equal to the batch recurrence; re-delivery dropped, regression fails loudly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming.{SeriesPoint, EwmaPoint}
    val stream = MemoryStream[SeriesPoint]
    val out = Streaming.statefulEwma(stream.toDS())
    val q = out.writeStream.outputMode("append").format("memory").queryName("ewma_out").start()
    // seq-ascending across batches, split mid-series; one re-delivery of
    // the committed seq in batch 2 (must be dropped, not re-smoothed)
    stream.addData(SeriesPoint(1L, 1L, 10.0), SeriesPoint(1L, 2L, 20.5), SeriesPoint(2L, 1L, 5.25))
    q.processAllAvailable()
    stream.addData(SeriesPoint(1L, 2L, 20.5), SeriesPoint(1L, 3L, 30.0), SeriesPoint(2L, 2L, 9.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ewma_out").as[EwmaPoint].collect()
      .map(p => (p.symbol, p.seq, p.ewma_fp)).toSet

    // batch reference: the same series through Analytics.ewmaFixedPoint
    def d(i: Long) = java.sql.Date.valueOf(f"2024-$i%02d-01")
    val batch = graft.ops.Analytics.ewmaFixedPoint(
      Seq((1L, d(1), 10.0), (1L, d(2), 20.5), (1L, d(3), 30.0),
        (2L, d(1), 5.25), (2L, d(2), 9.0)).toDF("symbol", "date", "price"),
      "symbol", "date", "price")
      .select("symbol", "date", "ewma_fp")
      .as[(Long, java.sql.Date, Long)].collect()
      .map { case (s, dt, fp) => (s, dt.toLocalDate.getMonthValue.toLong, fp) }.toSet
    assert(streamed == batch, "streaming state must replay the batch recurrence exactly")

    // a whole replayed span (seqs at/below committed) is dropped silently —
    // the at-least-once offset-reset case — and does NOT perturb the state
    val stream2 = MemoryStream[SeriesPoint]
    val q2 = Streaming.statefulEwma(stream2.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ewma_replay").start()
    stream2.addData(SeriesPoint(1L, 4L, 10.0), SeriesPoint(1L, 5L, 20.5))
    q2.processAllAvailable()
    stream2.addData(SeriesPoint(1L, 4L, 10.0), SeriesPoint(1L, 5L, 20.5), SeriesPoint(1L, 6L, 30.0))
    q2.processAllAvailable()
    q2.stop()
    val replayed = spark.table("ewma_replay").as[EwmaPoint].collect().sortBy(_.seq)
    assert(replayed.map(_.seq).toSeq == Seq(4L, 5L, 6L), "replayed span emits nothing twice")
    // seq 6 folds against the state from the FIRST delivery of 4-5
    val s45 = Math.floorDiv(20500000L + 3 * 10000000L, 4)
    assert(replayed.last.ewma_fp == Math.floorDiv(30000000L + 3 * s45, 4))
  }

  test("statefulEwma: negative values divide exactly like the batch `div` (truncation, not floor)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming.{SeriesPoint, EwmaPoint}
    // -10.000001 then 20.5: the smoothed numerator is -9500003, where
    // truncating division (SQL `div`, what the batch op uses) gives
    // -2375000 but floorDiv gives -2375001 — this series distinguishes them
    val stream = MemoryStream[SeriesPoint]
    val q = Streaming.statefulEwma(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("ewma_neg").start()
    stream.addData(SeriesPoint(1L, 1L, -10.000001), SeriesPoint(1L, 2L, 20.5))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ewma_neg").as[EwmaPoint].collect()
      .map(p => (p.seq, p.ewma_fp)).toSet
    assert(streamed == Set((1L, -10000001L), (2L, -2375000L)))

    def d(i: Long) = java.sql.Date.valueOf(f"2024-$i%02d-01")
    val batch = graft.ops.Analytics.ewmaFixedPoint(
      Seq((1L, d(1), -10.000001), (1L, d(2), 20.5)).toDF("symbol", "date", "price"),
      "symbol", "date", "price")
      .select("date", "ewma_fp").as[(java.sql.Date, Long)].collect()
      .map { case (dt, fp) => (dt.toLocalDate.getMonthValue.toLong, fp) }.toSet
    assert(batch == streamed, "negative-input stream and batch recurrences must stay bit-equal")
  }

  test("statefulEwma: kill and restart from checkpoint continues the recurrence bit-exactly") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming.{SeriesPoint, EwmaPoint}
    val ckpt = Files.createTempDirectory("graft-ewma-ckpt").toString
    val buf = scala.collection.concurrent.TrieMap[(Long, Long), Long]()
    val stream = MemoryStream[SeriesPoint]
    def start() = Streaming.statefulEwma(stream.toDS())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[EwmaPoint], _: Long) =>
        df.collect().foreach(p => buf((p.symbol, p.seq)) = p.ewma_fp): Unit
      }
      .start()
    val q1 = start()
    stream.addData(SeriesPoint(1L, 1L, 10.0), SeriesPoint(1L, 2L, 20.5))
    q1.processAllAvailable(); q1.stop()
    // crash analog: a new query instance from the same checkpoint — the
    // per-key state (last ewma_fp) must be recovered, not re-derived
    val q2 = start()
    stream.addData(SeriesPoint(1L, 3L, 30.0))
    q2.processAllAvailable(); q2.stop()
    val s2 = Math.floorDiv(20500000L + 3 * 10000000L, 4)
    val s3 = Math.floorDiv(30000000L + 3 * s2, 4)
    assert(buf.toMap == Map(
      (1L, 1L) -> 10000000L, (1L, 2L) -> s2, (1L, 3L) -> s3),
      "post-restart point must fold against the checkpointed state")
  }

  test("completionPayload serializes the stats row for the completion topic (A2)") {
    val stats = Seq((42L, 1L, 40L, "complete"))
      .toDF("record_count", "total_batches", "total_assets", "status")
    val out = Streaming.completionPayload(stats, "MARKET_DATA_UPDATE_COMPLETE")
      .as[(String, String)].collect()
    assert(out.length == 1)
    val (topic, value) = out.head
    assert(topic == "MARKET_DATA_UPDATE_COMPLETE")
    val parsed = spark.read.json(Seq(value).toDS())
    val row = parsed.select("record_count", "total_batches", "total_assets", "status")
      .as[(Long, Long, Long, String)].head()
    assert(row == ((42L, 1L, 40L, "complete")))
  }

  test("topic routing dispatches known topics, tags unknown") {
    val msgs = Seq(
      ("MARKET_DATA_UPDATE_REQUEST", "{}"), ("HISTORICAL_MARKET_DATA_REQUEST", "{}"),
      ("BOGUS_TOPIC", "{}"), ("MARKET_INDEX_DATA_UPDATE_REQUEST", " "))
      .toDF("topic", "value")
    val routed = Streaming.routeTopics(
      Streaming.decodeRequests(msgs.filter(length(trim(col("value"))) >= 0)
        .withColumn("value", col("value").cast("binary"))),
      Seq(
        "MARKET_DATA_UPDATE_REQUEST" -> "market_data",
        "HISTORICAL_MARKET_DATA_REQUEST" -> "historical",
        "MARKET_INDEX_DATA_UPDATE_REQUEST" -> "index"))
    val got = routed.select("topic", "job").as[(String, String)].collect().toMap
    assert(got("MARKET_DATA_UPDATE_REQUEST") == "market_data")
    assert(got("BOGUS_TOPIC") == "unknown")
    assert(!got.contains("MARKET_INDEX_DATA_UPDATE_REQUEST")) // empty value skipped
  }

  test("file-source events stream: foreachBatch merge equals batch last-wins snapshot") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // streams require an explicit schema: take the file's ACTUAL schema from
    // a batch read so the test tracks either storage layout (ns-long or µs
    // timestamp), then normalize through the same seam the batch path uses
    val fileSchema = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet").schema
    // the file source watches a landing DIRECTORY; stage the file into one
    val landing = Files.createTempDirectory("graft-landing")
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      landing.resolve("events.parquet"))
    val stream = Tables.normalizeEvents(
      spark.readStream
        .schema(fileSchema)
        .parquet(landing.toString))
      .select("user_id", "event_type", "value", "ts", "event_id")
    val snap = new Streaming.SnapshotStream(Seq("user_id", "event_type"), Seq("ts", "event_id"))
    val ckpt = Files.createTempDirectory("graft-file-ckpt").toString
    val q = snap.start(stream, ckpt)
    q.processAllAvailable(); q.stop()
    val streamed = snap.current.get
      .select("user_id", "event_type", "value").as[(Long, String, Double)].collect().toSet
    val batch = Merge.lastWins(
      Tables.events(spark, TestSpark.sf0001)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"), col("event_id")),
      Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_type", "value").as[(Long, String, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("fixed-point HLL estimate is within rsd bounds of exact") {
    val got = graft.SparkEntry.qApproxUsers(spark, TestSpark.sf0001)
      .select("event_type", "approx_users").as[(String, Double)].collect().toMap
    val exact = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("u"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(got(k) - ex) / ex < 0.15, s"$k: approx=${got(k)} exact=$ex")
    }
  }

  test("fixed-point HLL: merged per-day registers equal the one-pass register file; both estimator branches agree with the formula") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type"), col("user_id"), col("ts").cast("date").as("d"))
    val merged = Analytics.hllMerge(
      Analytics.hllRegisters(ev, Seq("event_type", "d"), "user_id"), Seq("event_type"))
      .as[(String, Long, Long)].collect().toSet
    val onePass = Analytics.hllRegisters(ev, Seq("event_type"), "user_id")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == onePass, "register max-monoid fold must be lossless")
    // incremental estimate == one-pass estimate, trivially, given equal registers
    val estInc = graft.SparkEntry.qHllIncremental(spark, TestSpark.sf0001)
      .as[(String, Double)].collect().toMap
    val estOne = Analytics.hllEstimate(
      Analytics.hllRegisters(ev, Seq("event_type"), "user_id"), Seq("event_type"))
      .as[(String, Double)].collect().toMap
    assert(estInc == estOne)
    // the raw branch engages on a high-cardinality key (> 2.5m distinct):
    // estimate must stay within ~4 rsd of exact (rsd ≈ 1.04/sqrt(256) ≈ 6.5%)
    val wide = spark.range(0, 5000).selectExpr("'k' AS k", "id AS v")
    val est = Analytics.hllEstimate(
      Analytics.hllRegisters(wide, Seq("k"), "v"), Seq("k"))
      .as[(String, Double)].collect().head._2
    assert(est > 2.5 * 256, "5000 distinct must clear the linear-counting cutoff")
    assert(math.abs(est - 5000) / 5000 < 0.26, s"raw-HLL estimate $est vs 5000")
  }

  test("multimodal: frame sampling is deterministic with bounded per-media fan-out") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(40)
    val packed = MultimodalOps.packBinary(docs, "doc_id", "text", "video")
    val f1 = MultimodalOps.sampleFrames(spark, packed, everyMs = 1000L, maxFrames = 8)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    val f2 = MultimodalOps.sampleFrames(spark, packed, everyMs = 1000L, maxFrames = 8)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(f1.map(f => (f.media_id, f.frame_idx, f.ts_ms, f.width, f.height)).toSeq ==
      f2.map(f => (f.media_id, f.frame_idx, f.ts_ms, f.width, f.height)).toSeq)
    val perMedia = f1.groupBy(_.media_id)
    assert(perMedia.size == 40)
    assert(perMedia.values.forall(fs => fs.length >= 1 && fs.length <= 8))
    // frame indices contiguous from 0, ts spaced by everyMs
    assert(perMedia.values.forall(fs =>
      fs.sortBy(_.frame_idx).zipWithIndex.forall { case (f, i) => f.frame_idx == i && f.ts_ms == i * 1000L }))
    assert(f1.forall(f => f.thumb.length == 8 && f.width >= 16 && f.height >= 16))
  }

  test("multimodal: audio windowing is deterministic with correct overlap geometry") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(40)
    val packed = MultimodalOps.packBinary(docs, "doc_id", "text", "audio")
    val w1 = MultimodalOps.sampleAudioWindows(spark, packed, windowMs = 2000L, hopMs = 1000L)
      .collect().sortBy(w => (w.media_id, w.window_idx))
    val w2 = MultimodalOps.sampleAudioWindows(spark, packed, windowMs = 2000L, hopMs = 1000L)
      .collect().sortBy(w => (w.media_id, w.window_idx))
    assert(w1.map(w => (w.media_id, w.window_idx, w.start_ms, w.end_ms)).toSeq ==
      w2.map(w => (w.media_id, w.window_idx, w.start_ms, w.end_ms)).toSeq)
    val perMedia = w1.groupBy(_.media_id)
    assert(perMedia.size == 40)
    assert(perMedia.values.forall(ws => ws.length >= 1 && ws.length <= 16))
    perMedia.values.foreach { ws =>
      val sorted = ws.sortBy(_.window_idx)
      // contiguous indices, hop spacing, window length bounded, 50% overlap
      sorted.zipWithIndex.foreach { case (w, i) =>
        assert(w.window_idx == i && w.start_ms == i * 1000L)
        assert(w.end_ms > w.start_ms && w.end_ms <= w.start_ms + 2000L)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.start_ms < a.end_ms, "windows must overlap at this hop")
        case _           =>
      }
    }
    assert(w1.forall(w => w.rms >= 0.0 && w.rms < 1.0 && w.peak >= 0.0 && w.peak < 1.0))
  }

  test("multimodal: resize fits the maxDim box, preserves aspect ratio, never upscales") {
    import graft.ops.MultimodalOps
    val packed = MultimodalOps.packBinary(
      Tables.documents(spark, TestSpark.sf0001), "doc_id", "text", "image")
    val resized = MultimodalOps.resizeMedia(spark, packed, maxDim = 256).collect()
    assert(resized.length == packed.count())
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= math.max(256, math.max(r.src_width, r.src_height)))
      assert(r.width <= r.src_width && r.height <= r.src_height, "never upscale")
      // aspect ratio preserved within integer rounding: truncating the
      // smaller dimension by 1 shifts the ratio by at most 1/min(w,h)
      val srcAr = r.src_width.toDouble / r.src_height
      val dstAr = r.width.toDouble / r.height
      assert(math.abs(srcAr - dstAr) / srcAr <= 1.0 / math.min(r.width, r.height) + 1e-9,
        s"$srcAr vs $dstAr at ${r.width}x${r.height}")
      assert(r.n_bytes == r.payload.length.toLong)
    }
    // deterministic
    val again = MultimodalOps.resizeMedia(spark, packed, maxDim = 256).collect()
    assert(resized.map(r => (r.media_id, r.width, r.height, r.n_bytes)).toSet ==
      again.map(r => (r.media_id, r.width, r.height, r.n_bytes)).toSet)
  }

  test("multimodal: pack → mapPartitions feature extraction is deterministic and total") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(50)
    val packed = MultimodalOps.packBinary(docs, "doc_id", "text", "text")
    val f1 = MultimodalOps.extractFeatures(spark, packed).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(spark, packed).collect().sortBy(_.media_id)
    assert(f1.length == 50)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.n_bytes > 0 && f.width >= 16 && f.height >= 16))
  }

  test("streaming audit scorecard: RollupStream over rowCheckLong ≡ one-shot auditRows across kill/restart") {
    import graft.ops.AuditOps
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq((1L, Some(10.0)), (2L, Some(-1.0)))
    val b2 = Seq((3L, None: Option[Double]), (4L, Some(5.0)))
    val checks = Seq(
      "v_positive" -> !(col("v") > 0),
      "v_complete" -> col("v").isNull)
    val stream = MemoryStream[(Long, Option[Double])]
    val longDf = AuditOps.rowCheckLong(stream.toDF().toDF("id", "v"), "t", checks)
    val ckpt = Files.createTempDirectory("graft-audit-ckpt").toString
    val store = Files.createTempDirectory("graft-audit-store").toString + "/audit"
    val keys = Seq("check_name", "table_name")
    val roll1 = new Streaming.RollupStream(keys, "viol", Some(store))
    val q1 = roll1.start(longDf, ckpt)
    stream.addData(b1); q1.processAllAvailable(); q1.stop()
    // kill/restart: the scorecard rebuilds from the per-batch slots
    val roll2 = new Streaming.RollupStream(keys, "viol", Some(store))
    val q2 = roll2.start(longDf, ckpt)
    stream.addData(b2); q2.processAllAvailable(); q2.stop()
    def card(df: DataFrame) = AuditOps.scorecardFromRollup(df)
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSet
    val streamed = card(roll2.current.get)
    val oneShot = AuditOps.auditRows((b1 ++ b2).toDF("id", "v"), "t", checks)
      .select("check_name", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(streamed == oneShot)
    assert(streamed == Set(
      ("v_positive", 2L, 4L, false),  // -1, and the NULL counts conservatively
      ("v_complete", 1L, 4L, false)))
  }

  test("streaming quantile sketch: RollupStream over fixedBin ≡ one-shot estimates across kill/restart") {
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, nBins) = (0L, 100L, 10)
    val qs = Seq(500, 900)
    // values straddle both clamp edges across the two batches, and one
    // NULL rides along: the rollup counts it under a NULL bin, the
    // finalize drops that group, so streamed ≡ one-shot (which filters
    // NULLs at the aggregate) even on NULL-bearing streams
    val b1 = Seq((1L, "a", Some(5L)), (2L, "a", Some(37L)), (3L, "b", Some(-4L)),
      (4L, "a", Some(62L)))
    val b2 = Seq((5L, "a", Some(120L)), (6L, "b", Some(41L)), (7L, "b", Some(99L)),
      (8L, "a", Some(37L)), (9L, "b", None: Option[Long]))
    val stream = MemoryStream[(Long, String, Option[Long])]
    val binned = stream.toDF().toDF("id", "k", "v")
      .select(col("k"), Analytics.fixedBin("v", lo, hi, nBins).as("bin"), lit(1L).as("one"))
    val ckpt = Files.createTempDirectory("graft-hq-ckpt").toString
    val store = Files.createTempDirectory("graft-hq-store").toString + "/hist"
    val keys = Seq("k", "bin")
    val roll1 = new Streaming.RollupStream(keys, "one", Some(store))
    val q1 = roll1.start(binned, ckpt)
    stream.addData(b1); q1.processAllAvailable(); q1.stop()
    // kill/restart: the sketch counts rebuild from the per-batch slots
    val roll2 = new Streaming.RollupStream(keys, "one", Some(store))
    val q2 = roll2.start(binned, ckpt)
    stream.addData(b2); q2.processAllAvailable(); q2.stop()
    def est(hist: DataFrame) =
      Analytics.quantilesFromCounts(hist, Seq("k"), qs, lo, hi, nBins)
        .select("k", "q_permille", "n_total", "est")
        .as[(String, Long, Long, Long)].collect().toSet
    // the rollup's n IS the per-(k, bin) row count — the sketch statistic
    val streamed = est(roll2.current.get.select(col("k"), col("bin"), col("n")))
    val oneShot = est(Analytics.histogramFixed(
      (b1 ++ b2).toDF("id", "k", "v"), Seq("k"), "v", lo, hi, nBins))
    assert(streamed == oneShot)
    // hand check: k=a values {5, 37, 37, 62, 120→clamp bin 9}: n=5,
    // p50 target rank 3 → 37 in bin 3 → upper edge 40; p90 rank 5 → bin 9 → 100
    assert(streamed.contains(("a", 500L, 5L, 40L)))
    assert(streamed.contains(("a", 900L, 5L, 100L)))
  }

  test("streaming DSIR model: RollupStream over dsirFeatureRows ≡ one-shot weights across kill/restart") {
    import graft.ops.TextOps
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq((1L, "the quick brown fox", "en"), (2L, "der schnelle fuchs", "de"))
    val b2 = Seq((3L, "the lazy dog sleeps", "en"), (4L, "le chien paresseux", "fr"),
      (5L, "   ", "en")) // zero-feature doc rides along
    val stream = MemoryStream[(Long, String, String)]
    val rows = TextOps.dsirFeatureRows(
      stream.toDF().toDF("doc_id", "text", "lang"), "text", col("lang") === "en")
    val ckpt = Files.createTempDirectory("graft-dsir-ckpt").toString
    val store = Files.createTempDirectory("graft-dsir-store").toString + "/dsir"
    val keys = Seq("bucket", "is_t")
    val roll1 = new Streaming.RollupStream(keys, "one", Some(store))
    val q1 = roll1.start(rows, ckpt)
    stream.addData(b1); q1.processAllAvailable(); q1.stop()
    // kill/restart: the bucket model rebuilds from the per-batch slots
    val roll2 = new Streaming.RollupStream(keys, "one", Some(store))
    val q2 = roll2.start(rows, ckpt)
    stream.addData(b2); q2.processAllAvailable(); q2.stop()
    val docs = (b1 ++ b2).toDF("doc_id", "text", "lang")
    def weights(model: DataFrame) = TextOps.dsirWeightsFromModel(
      docs, "doc_id",
      TextOps.dsirFeatures(docs, "doc_id", "text", col("lang") === "en"), model)
      .as[(Long, Long, Long)].collect().toSet
    val streamed = weights(TextOps.dsirModelFromRollup(roll2.current.get))
    val oneShot = TextOps.dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == oneShot)
    assert(streamed.exists(r => r._1 == 5L && r._2 == 0L && r._3 == 0L),
      "zero-feature doc scores 0 under the streamed model too")
  }

  test("streaming count-min sketch: RollupStream over cmsCells ≡ one-shot estimates across kill/restart") {
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    val (depth, width) = (3, 16) // narrow: collisions likely, still exact vs one-shot
    // a NULL value rides along in batch 2: cmsCells drops it, matching
    // the one-shot sketch's NULL filter
    val b1 = Seq((1L, "a", Some(5L)), (2L, "a", Some(5L)), (3L, "b", Some(-4L)),
      (4L, "a", Some(62L)))
    val b2 = Seq((5L, "a", Some(5L)), (6L, "b", Some(-4L)), (7L, "b", Some(99L)),
      (8L, "a", Some(62L)), (9L, "b", None: Option[Long]))
    val stream = MemoryStream[(Long, String, Option[Long])]
    val cells = Analytics.cmsCells(
      stream.toDF().toDF("id", "k", "v"), Seq("k"), "v", depth, width)
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val store = Files.createTempDirectory("graft-cms-store").toString + "/cms"
    val keys = Seq("k", "row_id", "slot")
    val roll1 = new Streaming.RollupStream(keys, "one", Some(store))
    val q1 = roll1.start(cells, ckpt)
    stream.addData(b1); q1.processAllAvailable(); q1.stop()
    // kill/restart: the sketch cells rebuild from the per-batch slots
    val roll2 = new Streaming.RollupStream(keys, "one", Some(store))
    val q2 = roll2.start(cells, ckpt)
    stream.addData(b2); q2.processAllAvailable(); q2.stop()
    val all = (b1 ++ b2).toDF("id", "k", "v")
    def est(sketch: DataFrame) =
      Analytics.cmsEstimate(sketch, all, Seq("k"), "v", depth, width)
        .as[(String, Long, Long)].collect().toSet
    // the rollup's n IS the per-(k, row_id, slot) cell count
    val streamed = est(roll2.current.get
      .select(col("k"), col("row_id"), col("slot"), col("n")))
    val oneShot = est(Analytics.cmsSketch(all, Seq("k"), "v", depth, width))
    assert(streamed == oneShot)
    // hand check: est >= exact on every probe; ("a", 5) appeared 3 times
    val exact = Map(("a", 5L) -> 3L, ("a", 62L) -> 2L, ("b", -4L) -> 2L, ("b", 99L) -> 1L)
    streamed.foreach { case (k, v, e) => assert(e >= exact((k, v))) }
    assert(streamed.map { case (k, v, _) => (k, v) } == exact.keySet)
  }

  test("streaming drift monitor: RollupStream over fixedBin ≡ one-shot contributions across kill/restart") {
    import graft.ops.Analytics
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, nBins) = (0L, 100L, 10)
    // per-source metric values straddling both clamp edges, plus a NULL:
    // the rollup counts it under a NULL bin, driftFromCounts drops that
    // group, so streamed ≡ one-shot (which filters NULLs at the histogram)
    val b1 = Seq((1L, "web", Some(5L)), (2L, "web", Some(37L)), (3L, "books", Some(-4L)),
      (4L, "web", Some(62L)))
    val b2 = Seq((5L, "web", Some(120L)), (6L, "books", Some(41L)), (7L, "books", Some(99L)),
      (8L, "web", Some(37L)), (9L, "books", None: Option[Long]))
    val stream = MemoryStream[(Long, String, Option[Long])]
    val binned = stream.toDF().toDF("id", "g", "v")
      .select(col("g"), Analytics.fixedBin("v", lo, hi, nBins).as("bin"), lit(1L).as("one"))
    val ckpt = Files.createTempDirectory("graft-hd-ckpt").toString
    val store = Files.createTempDirectory("graft-hd-store").toString + "/hist"
    val keys = Seq("g", "bin")
    val roll1 = new Streaming.RollupStream(keys, "one", Some(store))
    val q1 = roll1.start(binned, ckpt)
    stream.addData(b1); q1.processAllAvailable(); q1.stop()
    // kill/restart: the drift counts rebuild from the per-batch slots
    val roll2 = new Streaming.RollupStream(keys, "one", Some(store))
    val q2 = roll2.start(binned, ckpt)
    stream.addData(b2); q2.processAllAvailable(); q2.stop()
    def drift(d: DataFrame) =
      d.select("g", "bin", "c_g", "c_r", "contrib_fp")
        .as[(String, Long, Long, Long, Long)].collect().toSet
    // the rollup's n IS the per-(g, bin) count — the drift monoid state
    val streamed = drift(Analytics.driftFromCounts(
      roll2.current.get.select(col("g"), col("bin"), col("n")), "g", nBins))
    val oneShot = drift(Analytics.histogramDriftByGroup(
      (b1 ++ b2).toDF("id", "g", "v"), "g", "v", lo, hi, nBins))
    assert(streamed == oneShot)
    // hand check: web counted 5 of 8 values, books 3; web's clamp-in bin 0
    // holds one value (the 5); both groups densify to the full bin domain
    assert(streamed.size == 2 * nBins)
    assert(streamed.exists(r => r._1 == "web" && r._2 == 0L && r._3 == 1L && r._4 == 2L))
  }

  test("streaming embedding drift: RollupStream over (label, dim) ≡ one-shot across kill/restart") {
    import graft.ops.SimilarityOps
    implicit val sqlCtx = spark.sqlContext
    // two labels, negative components included; label 1 drifts from the corpus
    val b1 = Seq((1L, 0, Seq(0.2, -0.4, 0.1)), (2L, 0, Seq(0.3, -0.2, 0.0)),
      (3L, 1, Seq(-0.9, 0.8, 0.5)))
    val b2 = Seq((4L, 1, Seq(-0.7, 0.9, 0.6)), (5L, 0, Seq(0.25, -0.3, 0.05)))
    val stream = MemoryStream[(Long, Int, Seq[Double])]
    // the rollup's per-key state is ALREADY the drift monoid: n counts
    // the (label, dim) elements and __total sums the quantized component
    // — one rollup carries both statistics, nothing extra rides the stream
    val vq = stream.toDF().toDF("vec_id", "label", "emb")
      .select(col("label"), posexplode(transform(col("emb").cast("array<double>"),
        x => round(x * lit(1.0e6)).cast("long"))).as(Seq("dim", "q")))
    val ckpt = Files.createTempDirectory("graft-ed-ckpt").toString
    val store = Files.createTempDirectory("graft-ed-store").toString + "/sums"
    val keys = Seq("label", "dim")
    val roll1 = new Streaming.RollupStream(keys, "q", Some(store))
    val q1 = roll1.start(vq, ckpt)
    stream.addData(b1); q1.processAllAvailable(); q1.stop()
    // kill/restart: the sums rebuild from the per-batch slots
    val roll2 = new Streaming.RollupStream(keys, "q", Some(store))
    val q2 = roll2.start(vq, ckpt)
    stream.addData(b2); q2.processAllAvailable(); q2.stop()
    def drift(d: DataFrame) = d.select("label", "n_vecs", "share_fp", "dist")
      .as[(Int, Long, Long, Double)].collect().toSet
    // (sum, count) map straight onto (sq, cnt); the decimal sum is exact
    // on integer inputs, so the long cast cannot round
    val sums = roll2.current.get.select(col("label"), col("dim"),
      col("__total").cast("long").as("sq"), col("n").as("cnt"))
    val streamed = drift(SimilarityOps.centroidDriftFromSums(sums, "label"))
    val oneShot = drift(SimilarityOps.centroidDrift(
      (b1 ++ b2).toDF("vec_id", "label", "embedding"), "embedding", "label"))
    assert(streamed == oneShot)
    // hand check: 3-of-5 share for label 0 truncates to 600000, and the
    // drifting label is FARTHER from the corpus centroid than the bulk
    assert(streamed.exists(r => r._1 == 0 && r._2 == 3L && r._3 == 600000L))
    val dist = streamed.map(r => r._1 -> r._4).toMap
    assert(dist(1) > dist(0))
  }
}
