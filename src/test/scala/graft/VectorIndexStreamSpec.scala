package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SimilarityOps
import graft.streaming.Streaming
import graft.tools.SyntheticVectors

/** The streaming IVF index maintainer ([[Streaming.VectorIndexStream]]):
  * quantizer fit once (first batch or provided), every later batch
  * assigned with the SAME quantizer and appended — equal to a one-shot
  * assignment of everything, at-least-once safe, delta-slot persisted
  * with kill/restart recovery and between-runs compaction.
  */
class VectorIndexStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10 tight direction clusters of 20 vectors (ids c*1000 + i)
  private lazy val all = SyntheticVectors
    .clustered(nClusters = 10, perCluster = 20, dim = 8, seed = 41)
  private def slice(cLo: Int, cHi: Int) =
    all.filter { case (id, _) => id / 1000 >= cLo && id / 1000 < cHi }

  private def drain(
      vis: Streaming.VectorIndexStream,
      batches: Seq[Seq[(Long, Seq[Double])]],
      ck: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = vis.start(in.toDF().toDF("vec_id", "embedding"), ck)
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
  }

  test("HnswIndexStream: 3-batch ingest ≡ one-shot knnHnsw on the real corpus; re-fed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val probes = emb.filter(col("vec_id") < 20)
    // frozen quantizer trained on the full corpus — deterministic Lloyd,
    // so it EQUALS knnHnsw's internal fit on the same corpus and the
    // one-shot result is the exact comparator
    val cents = SimilarityOps.hnswFitCentroids(emb, "vec_id", "embedding")
    val oneShot = SimilarityOps.knnHnsw(emb, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet

    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val batches = Seq(
      rows.filter(_._1 % 3 == 0), rows.filter(_._1 % 3 == 1), rows.filter(_._1 % 3 == 2))
    val his = new Streaming.HnswIndexStream("vec_id", "embedding", cents)
    val in = MemoryStream[(Long, Seq[Double])]
    val q = his.start(in.toDF().toDF("vec_id", "embedding"),
      Files.createTempDirectory("graft-hnsw-ck").toString)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = his.search(probes, k = 10).get
        .select("probe_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(streamed == oneShot,
        "incrementally-folded index must equal the one-shot build exactly")
      // at-least-once: re-feeding a whole batch leaves the index unchanged
      // (id-idempotent vector fold; max-idempotent adjacency fold)
      in.addData(batches(1)); q.processAllAvailable()
      val again = his.search(probes, k = 10).get
        .select("probe_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(again == oneShot, "re-delivered batch must be a provable no-op")
    } finally q.stop()
  }

  test("HnswIndexStream: restart with storeDir rebuilds the full store adjacency before folding") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val probes = emb.filter(col("vec_id") < 20)
    val cents = SimilarityOps.hnswFitCentroids(emb, "vec_id", "embedding")
    val oneShot = SimilarityOps.knnHnsw(emb, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val store = Files.createTempDirectory("graft-hnsw-store").toString + "/hnsw"
    def feed(his: Streaming.HnswIndexStream, batches: Seq[Seq[(Long, Seq[Double])]]): Unit = {
      val in = MemoryStream[(Long, Seq[Double])]
      val q = his.start(in.toDF().toDF("vec_id", "embedding"),
        Files.createTempDirectory("graft-hnsw-rck").toString)
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
    }
    val his = new Streaming.HnswIndexStream(
      "vec_id", "embedding", cents, storeDir = Some(store))
    feed(his, Seq(rows.filter(_._1 % 3 == 0), rows.filter(_._1 % 3 == 1)))
    // crash analog: a FRESH instance recovers the vector state from the
    // slots; its first batch must rebuild the store×store adjacency
    // before folding the batch's pair blocks — seeding from the blocks
    // alone would drop every store-internal edge and truncate the graph
    val his2 = new Streaming.HnswIndexStream(
      "vec_id", "embedding", cents, storeDir = Some(store))
    feed(his2, Seq(rows.filter(_._1 % 3 == 2)))
    // the epoch-offset slot protocol: the restarted lineage's batch 0
    // must NOT have overwritten the first run's slot 0 (raw batchId slots
    // silently truncated the store to 333 of 500 vectors here)
    assert(his2.current.get.count() == emb.count(),
      "restart must preserve every banked vector")
    val streamed = his2.search(probes, k = 10).get
      .select("probe_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(streamed == oneShot,
      "post-restart fold must equal the one-shot build exactly")
  }

  test("streamed index == one-shot assignment with the first-batch quantizer; replay is a no-op") {
    val vis = new Streaming.VectorIndexStream("vec_id", "embedding", nLists = 8)
    val ck = Files.createTempDirectory("graft-vis-ck").toString
    drain(vis, Seq(slice(0, 4), slice(4, 7), slice(7, 10)), ck)
    val (ctr, asg) = vis.current.get
    assert(asg.select("vec_id").distinct().count() == 200)
    // every batch was assigned by the SAME (first-batch) quantizer, so the
    // maintained relation equals one ivfAssign over the whole corpus
    val oneShot = SimilarityOps
      .ivfAssign(ctr, all.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select("vec_id", "list_id").as[(Long, Int)].collect().toMap
    assert(asg.select("vec_id", "list_id").as[(Long, Int)].collect().toMap == oneShot)
    // a late-batch vector is immediately searchable: its nearest is a
    // tight cluster-mate
    val probes = all.toDF("vec_id", "embedding").filter(col("vec_id") === 9005L)
    val top = SimilarityOps
      .knnIvfSearch(ctr, asg, probes, "vec_id", "embedding", k = 3, nProbe = 2)
      .filter(col("rank") === 1).select("sim").as[Double].head()
    assert(top > 0.97, s"top sim $top")
    // full redelivery of an already-indexed batch fences to a no-op
    drain(vis, Seq(slice(4, 7)), Files.createTempDirectory("graft-vis-ck2").toString)
    assert(vis.current.get._2.count() == 200)
  }

  test("delta-slot store: kill/restart recovery, O(batch) slots, compaction, metrics") {
    val ml = new graft.tools.MetricsListener
    val store = Files.createTempDirectory("graft-vis-store").toString + "/vis"
    val vis = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store), metrics = Some(ml))
    drain(vis, Seq(slice(0, 4), slice(4, 7)),
      Files.createTempDirectory("graft-vis-ck3").toString)
    def slots = new java.io.File(store).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(slots == Seq("batch_id=0", "batch_id=1"))
    // each slot holds ONLY its batch's rows (O(batch) persistence)
    assert(spark.read.parquet(s"$store/batch_id=0/assigned").count() == 80)
    assert(spark.read.parquet(s"$store/batch_id=1/assigned").count() == 60)
    assert(ml.storeRecords.map(m => (m.batchId, m.sizesDeltaRows, m.storeDocs)) ==
      Seq((0L, 80L, 80L), (1L, 60L, 140L)))

    // crash analog: a FRESH instance recovers quantizer + assignment from
    // the store and keeps appending under new slot ids
    val vis2 = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store))
    drain(vis2, Seq(slice(7, 10)), Files.createTempDirectory("graft-vis-ck4").toString)
    val (ctr2, asg2) = vis2.current.get
    assert(asg2.select("vec_id").distinct().count() == 200)
    assert(slots == Seq("batch_id=0", "batch_id=1", "batch_id=2"))
    // recovered quantizer is THE persisted one: assignments still equal
    // the one-shot form under it
    val oneShot = SimilarityOps
      .ivfAssign(ctr2, all.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select("vec_id", "list_id").as[(Long, Int)].collect().toMap
    assert(asg2.select("vec_id", "list_id").as[(Long, Int)].collect().toMap == oneShot)

    // compaction folds the slots into one negative-id base; recovery from
    // the compacted store is exact
    assert(vis2.compact(spark) == 3)
    assert(slots == Seq("batch_id=-1"))
    val vis3 = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store))
    drain(vis3, Seq(Seq.empty[(Long, Seq[Double])]),
      Files.createTempDirectory("graft-vis-ck5").toString)
    assert(vis3.current.get._2.select("vec_id", "list_id").as[(Long, Int)]
      .collect().toMap == oneShot)
  }

  private def codesOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select(col("vec_id"), col("codes")).as[(Long, Seq[Long])].collect().toMap

  private def oneShotCodes(books: org.apache.spark.sql.DataFrame,
      conf: Streaming.PqIndexConfig): Map[Long, Seq[Long]] =
    codesOf(SimilarityOps.pqPack(SimilarityOps.pqEncode(
      all.toDF("vec_id", "embedding"), "vec_id", "embedding", conf.dim, conf.m, books),
      "vec_id"))

  test("PQ-coded store: per-batch coded slots, stream == one-shot encode, search from codes") {
    val conf = Streaming.PqIndexConfig(dim = 8, m = 2, kSub = 8)
    val store = Files.createTempDirectory("graft-vispq-store").toString + "/vis"
    val vis = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store), pq = Some(conf))
    drain(vis, Seq(slice(0, 4), slice(4, 7), slice(7, 10)),
      Files.createTempDirectory("graft-vispq-ck").toString)
    val (ctr, books, coded) = vis.currentPq.get
    // every batch encoded with the SAME (first-batch) codebooks: the
    // maintained coded relation equals one encode over the whole corpus
    assert(codesOf(coded) == oneShotCodes(books, conf))
    // each slot holds ONLY its batch's coded rows (O(batch) persistence)
    assert(spark.read.parquet(s"$store/batch_id=0/coded").count() == 80)
    assert(spark.read.parquet(s"$store/batch_id=2/coded").count() == 60)
    // compressed-store search: a tight cluster-mate of a late-batch vector
    // surfaces from the codes alone (no raw vectors at search time)
    val probes = all.toDF("vec_id", "embedding").filter(col("vec_id") === 9005L)
    val lists = SimilarityOps.ivfProbeLists(ctr, probes, "vec_id", "embedding", nProbe = 2)
      .select(col("probe_id"), col("list_id"))
    val top = SimilarityOps.knnIvfPqSearchWithLists(
      lists, books, coded, probes, "vec_id", "embedding",
      conf.dim, conf.m, k = 3)
      .filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    assert(top / 1000 == 9, s"rank-1 neighbor $top is not a cluster-mate of 9005")
  }

  test("pre-fit codebooks via PqIndexConfig.codebooks are used AND persisted with the store") {
    val books = SimilarityOps.pqTrain(
      all.toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 8, m = 2, kSub = 8, iters = 2)
    val conf = Streaming.PqIndexConfig(dim = 8, m = 2, kSub = 8, codebooks = Some(books))
    val store = Files.createTempDirectory("graft-vispq3-store").toString + "/vis"
    val vis = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store), pq = Some(conf))
    drain(vis, Seq(slice(0, 5), slice(5, 10)),
      Files.createTempDirectory("graft-vispq3-ck").toString)
    val (_, usedBooks, coded) = vis.currentPq.get
    assert(codesOf(coded) == oneShotCodes(books, conf))
    // the provided codebooks were persisted on first store contact, so a
    // recovering instance WITHOUT the parameter encodes identically
    assert(new java.io.File(s"$store/pq_codebooks/_SUCCESS").exists())
    val vis2 = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store),
      pq = Some(conf.copy(codebooks = None)))
    drain(vis2, Seq(Seq.empty[(Long, Seq[Double])]),
      Files.createTempDirectory("graft-vispq3-ck2").toString)
    assert(codesOf(vis2.currentPq.get._3) == oneShotCodes(books, conf))
    assert(usedBooks.select("sub", "cid", "cfp").as[(Long, Long, Seq[Long])].collect().toSet ==
      books.select("sub", "cid", "cfp").as[(Long, Long, Seq[Long])].collect().toSet)
  }

  test("enabling PQ over a pre-PQ store: fit-on-recovery, derived coded slots, compacted materialization") {
    val conf = Streaming.PqIndexConfig(dim = 8, m = 2, kSub = 8)
    val store = Files.createTempDirectory("graft-vispq2-store").toString + "/vis"
    val plain = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store))
    drain(plain, Seq(slice(0, 4), slice(4, 7)),
      Files.createTempDirectory("graft-vispq2-ck").toString)
    assert(!new java.io.File(s"$store/batch_id=0/coded").exists())

    // a PQ-enabled instance over the same store: codebooks fit ONCE on the
    // recovered corpus (persisted), old slots' coded rows derived on fold,
    // the new batch's slot written with coded rows materialized
    val vispq = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store), pq = Some(conf))
    drain(vispq, Seq(slice(7, 10)),
      Files.createTempDirectory("graft-vispq2-ck2").toString)
    val (_, books, coded) = vispq.currentPq.get
    assert(coded.count() == 200)
    assert(codesOf(coded) == oneShotCodes(books, conf))
    assert(new java.io.File(s"$store/pq_codebooks/_SUCCESS").exists())
    assert(new java.io.File(s"$store/batch_id=2/coded").exists())
    assert(!new java.io.File(s"$store/batch_id=0/coded").exists())

    // compaction materializes the derived rows into the base slot; a fresh
    // instance recovers codebooks + coded store exactly
    assert(vispq.compact(spark) == 3)
    assert(new java.io.File(s"$store/batch_id=-1/coded").exists())
    val vis3 = new Streaming.VectorIndexStream(
      "vec_id", "embedding", nLists = 8, storeDir = Some(store), pq = Some(conf))
    drain(vis3, Seq(Seq.empty[(Long, Seq[Double])]),
      Files.createTempDirectory("graft-vispq2-ck3").toString)
    val (_, books3, coded3) = vis3.currentPq.get
    assert(codesOf(coded3) == oneShotCodes(books3, conf))
    // and the recovered codebooks ARE the persisted ones
    assert(books3.select("sub", "cid", "cfp").as[(Long, Long, Seq[Long])].collect().toSet ==
      books.select("sub", "cid", "cfp").as[(Long, Long, Seq[Long])].collect().toSet)
  }
}
