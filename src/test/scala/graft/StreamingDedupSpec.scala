package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupOps
import graft.streaming.Streaming

/** Streaming near-dup cluster maintenance (Streaming.NearDupClusterStream):
  * the micro-batched fold is proven EQUAL to a from-scratch batch
  * clustering over all documents ever seen, on the real corpus (uncapped)
  * and on a cap-stable synthetic corpus (capped), across a kill/restart
  * with a fully re-delivered batch (at-least-once).
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** From-scratch expected labeling: CC over the one-shot pair relation,
    * singletons self-labeled — the same relation the batch operators are
    * oracled against.
    */
  private def batchClusters(docs: DataFrame, maxDocFreq: Int): Set[(Long, Long)] = {
    val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5, maxDocFreq = maxDocFreq)
    docs.select(col("doc_id").as("id"))
      .join(DedupOps.connectedComponents(pairs, "doc_a", "doc_b"), Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .as[(Long, Long)].collect().toSet
  }

  private def streamedClusters(s: Streaming.NearDupClusterStream): Set[(Long, Long)] =
    s.clusters.get.select(col("id"), col("cluster_id")).as[(Long, Long)].collect().toSet

  test("stream-fed clustering equals from-scratch CC on the real corpus (uncapped)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val chunks = rows.grouped((rows.size + 2) / 3).toSeq
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    val ckpt = Files.createTempDirectory("graft-ndc-ckpt").toString
    val ndc = new Streaming.NearDupClusterStream(
      "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 0)
    val q = ndc.start(sdf, ckpt)
    chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
    q.stop()
    val expected = batchClusters(docs, maxDocFreq = 0)
    assert(streamedClusters(ndc) == expected)
    // sanity: the corpus actually contains non-trivial clusters
    assert(expected.exists { case (id, cid) => id != cid })
  }

  test("capped stream: kill/restart + fully re-delivered batch leaves the fold exact") {
    implicit val sqlCtx = spark.sqlContext
    // cap-stable corpus for maxDocFreq = 5: the boilerplate sentence is
    // shared by ALL docs and crosses the cap already within batch 1 (6
    // docs), so the hot set never changes mid-stream; family A's text is
    // shared by 3 batch-1 docs (df 3 ≤ 5) and one batch-2 doc (df 4 ≤ 5).
    // If a replayed batch-1 doubled df contributions, family A's shingles
    // would read df 7 > 5 at batch 2, the cross pairs would vanish, and
    // doc 103's row would break the equality below — the redelivery
    // fencing is load-bearing in this test, not incidental.
    // geometry: the capped Jaccard counts COMMON over non-hot grams but
    // sizes over ALL grams, so identical family docs score (N−h)/(N+h)
    // with N total grams and h hot boilerplate grams — famA is sized so
    // that lands at 22/38 ≈ 0.58 ≥ 0.5 (a 10-token boiler → h = 8)
    val boiler = "terms of service apply to all content on this page"
    val famA = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles slowly cross the ancient stone bridge near the waterfall"
    val batch1 = Seq(
      (1L, s"$famA $boiler"), (2L, s"$famA $boiler"), (3L, s"$famA $boiler"),
      (4L, s"completely unrelated text about volcano geology and magma $boiler"),
      (5L, s"another singleton document discussing medieval trade routes $boiler"),
      (6L, s"a third lone document on deep sea bioluminescence patterns $boiler"))
    val batch2 = Seq(
      (103L, s"$famA $boiler"),
      (104L, s"fresh singleton text about glacier formation and moraines $boiler"))
    val stream1 = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft-ndc2-ckpt").toString
    val store = Files.createTempDirectory("graft-ndc2-store").toString + "/ndc"
    val ndc1 = new Streaming.NearDupClusterStream(
      "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 5, Some(store))
    val q1 = ndc1.start(stream1.toDF().toDF("doc_id", "text"), ckpt)
    stream1.addData(batch1); q1.processAllAvailable(); q1.stop()
    // crash analog: a FRESH instance recovers from the persisted store; the
    // source then re-delivers ALL of batch 1 before batch 2 (at-least-once)
    val stream2 = MemoryStream[(Long, String)]
    val ckpt2 = Files.createTempDirectory("graft-ndc2-ckpt-b").toString
    val ndc2 = new Streaming.NearDupClusterStream(
      "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 5, Some(store))
    val q2 = ndc2.start(stream2.toDF().toDF("doc_id", "text"), ckpt2)
    stream2.addData(batch1); q2.processAllAvailable()
    stream2.addData(batch2); q2.processAllAvailable()
    q2.stop()
    val expected = batchClusters(
      (batch1 ++ batch2).toDF("doc_id", "text"), maxDocFreq = 5)
    assert(streamedClusters(ndc2) == expected)
    // the family resolved across the batch boundary: 103 joined {1,2,3}
    assert(streamedClusters(ndc2).contains((103L, 1L)))
    // a THIRD recovery sees the version the replayed run promoted
    val ndc3 = new Streaming.NearDupClusterStream(
      "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 5, Some(store))
    val stream3 = MemoryStream[(Long, String)]
    val q3 = ndc3.start(stream3.toDF().toDF("doc_id", "text"), Files.createTempDirectory("graft-ndc2-ckpt-c").toString)
    stream3.addData(Seq.empty[(Long, String)]); q3.processAllAvailable(); q3.stop()
    assert(streamedClusters(ndc3) == expected)
  }

  // ---- delta-slot persistence (store format v3) ----

  private val boiler = "terms of service apply to all content on this page"
  private val famA = "the quick brown fox jumps over the lazy dog while seventeen " +
    "green turtles slowly cross the ancient stone bridge near the waterfall"
  private def fixtureBatch1 = Seq(
    (1L, s"$famA $boiler"), (2L, s"$famA $boiler"), (3L, s"$famA $boiler"),
    (4L, s"completely unrelated text about volcano geology and magma $boiler"),
    (5L, s"another singleton document discussing medieval trade routes $boiler"),
    (6L, s"a third lone document on deep sea bioluminescence patterns $boiler"))
  private def fixtureBatch2 = Seq(
    (103L, s"$famA $boiler"),
    (104L, s"fresh singleton text about glacier formation and moraines $boiler"))

  private def runBatches(
      ndc: Streaming.NearDupClusterStream,
      batches: Seq[(Long, String)]*): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = ndc.start(stream.toDF().toDF("doc_id", "text"),
      Files.createTempDirectory("graft-ndc-ck").toString)
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
  }

  private def slotDirs(store: String): Seq[java.io.File] =
    new java.io.File(store).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))

  test("per-batch persistence is O(batch): slots hold only the batch's deltas") {
    val ml = new graft.tools.MetricsListener
    val store = Files.createTempDirectory("graft-ndc3-store").toString + "/ndc"
    val ndc = new Streaming.NearDupClusterStream(
      "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 5, Some(store), Some(ml))
    runBatches(ndc, fixtureBatch1, fixtureBatch2)
    assert(slotDirs(store).map(_.getName).sorted == Seq("batch_id=0", "batch_id=1"))
    // slot 1 persists ONLY batch 2: 2 size rows (not 8), and only the
    // labels batch 2 changed — 103 joined family A (label 1), 104 labels
    // itself; docs 1-6 keep their slot-0 labels and are NOT rewritten
    assert(spark.read.parquet(s"$store/batch_id=1/sizes").count() == 2)
    assert(spark.read.parquet(s"$store/batch_id=1/labels")
      .as[(Long, Long)].collect().toSet == Set((103L, 1L), (104L, 104L)))
    // the batch-2 posting delta indexes 2 docs' shingles, far below the
    // 8-doc bank: every posting's ids are a subset of {103, 104}
    val slot1Ids = spark.read.parquet(s"$store/batch_id=1/postings")
      .select(explode(col("__ids")).as("id")).as[Long].collect().toSet
    assert(slot1Ids == Set(103L, 104L))
    // the metric channel exposes the same shape, per batch
    val ms = ml.storeRecords
    assert(ms.map(m => (m.batchId, m.sizesDeltaRows, m.storeDocs)) == Seq((0L, 6L, 6L), (1L, 2L, 8L)))
    assert(ms(1).labelsDeltaRows == 2L && ms(1).postingsDeltaRows > 0L)
    // compaction folds both slots into one negative-id base, and a fresh
    // recovery from the compacted store is exact
    assert(ndc.compact(spark) == 2)
    assert(slotDirs(store).map(_.getName) == Seq("batch_id=-1"))
    val ndc2 = new Streaming.NearDupClusterStream(
      "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 5, Some(store))
    runBatches(ndc2, Seq.empty)
    val expected = batchClusters(
      (fixtureBatch1 ++ fixtureBatch2).toDF("doc_id", "text"), maxDocFreq = 5)
    assert(streamedClusters(ndc2) == expected)
    // ...and post-compaction increments land as new slots above the base
    runBatches(ndc2, Seq((205L, s"$famA $boiler")))
    assert(slotDirs(store).map(_.getName).sorted == Seq("batch_id=-1", "batch_id=0"))
    assert(streamedClusters(ndc2).contains((205L, 1L)))
  }

  test("recovery migrates the legacy full-rewrite store layouts (v1 and v2)") {
    val docs = fixtureBatch1.toDF("doc_id", "text")
    val expected = batchClusters(docs, maxDocFreq = 0)
    val sh = DedupOps.hashedShingles(docs, "doc_id", "text", 3)
    val (post, sizes) = DedupOps.shingleBankFromSets(sh, "doc_id")
    val labels = expected.toSeq.toDF("id", "cluster_id")
    def commitVersion(store: String, write: String => Unit): Unit = {
      write(s"$store/v=0")
      Files.createFile(java.nio.file.Paths.get(s"$store/v=0/_SUCCESS")): Unit
    }
    def recovered(store: String): Streaming.NearDupClusterStream = {
      val ndc = new Streaming.NearDupClusterStream(
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 0, Some(store))
      runBatches(ndc, Seq.empty)
      ndc
    }
    // v2: v=<id>/{postings,sizes,labels}
    val storeV2 = Files.createTempDirectory("graft-ndc-v2").toString + "/ndc"
    commitVersion(storeV2, { v =>
      post.write.parquet(s"$v/postings")
      sizes.write.parquet(s"$v/sizes")
      labels.write.parquet(s"$v/labels")
    })
    val fromV2 = recovered(storeV2)
    assert(streamedClusters(fromV2) == expected)
    assert(slotDirs(storeV2).map(_.getName) == Seq("batch_id=-1"))
    assert(!new java.io.File(s"$storeV2/v=0").exists())
    // v1: v=<id>/{bank,df,labels} — postings rebuilt from the (id, sh) sets
    val storeV1 = Files.createTempDirectory("graft-ndc-v1").toString + "/ndc"
    commitVersion(storeV1, { v =>
      sh.write.parquet(s"$v/bank")
      post.select(col("s"), size(col("__ids")).as("df")).write.parquet(s"$v/df")
      labels.write.parquet(s"$v/labels")
    })
    val fromV1 = recovered(storeV1)
    assert(streamedClusters(fromV1) == expected)
    assert(slotDirs(storeV1).map(_.getName) == Seq("batch_id=-1"))
    // the migrated store keeps working: a redelivered doc is fenced, a new
    // doc pairs against the rebuilt bank
    runBatches(fromV1, fixtureBatch1 :+ (103L, s"$famA $boiler"))
    assert(streamedClusters(fromV1).contains((103L, 1L)))
    assert(spark.read.parquet(s"$storeV1/batch_id=0/sizes").count() == 1)
    // an unrecognizable version layout fails loudly instead of starting empty
    val storeBad = Files.createTempDirectory("graft-ndc-bad").toString + "/ndc"
    commitVersion(storeBad, { v =>
      labels.write.parquet(s"$v/labels")
    })
    val err = intercept[IllegalStateException] {
      recovered(storeBad)
    }
    assert(err.getMessage.contains("unrecognized NearDupClusterStream store layout"))
  }

  test("SubstringSpanStream: per-batch emissions partition the from-scratch span set; replay fenced") {
    // real corpus + two plants whose carriers straddle the batch cuts;
    // final per-gram df (4 and 6 carriers) sits far below the cap, so the
    // corpus is cap-stable and stream ≡ from-scratch must hold exactly
    val planted = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 151 === 0,
          lit(" " + (1 to 30).map(i => s"strp$i").mkString(" "))).otherwise(lit("")),
        when(col("doc_id") % 97 === 0,
          lit(" " + (1 to 26).map(i => s"strq$i").mkString(" "))).otherwise(lit(""))))
      .cache()
    val full = DedupOps.substringSpans(planted, "doc_id", "text", k = 8, minSpanTokens = 24)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(full.nonEmpty, "the planted corpus must have spans to maintain")
    val s = new Streaming.SubstringSpanStream("doc_id", "text", k = 8, minSpanTokens = 24)
    val batches = Seq(
      planted.filter(col("doc_id") < 160),
      planted.filter(col("doc_id") >= 160 && col("doc_id") < 320),
      planted.filter(col("doc_id") >= 320))
    val emissions = batches.map(b =>
      s.ingest(b).as[(Long, Long, Long, Long, Long)].collect().toSet)
    assert(emissions.reduce(_ ++ _) == full,
      "the union of per-batch emissions must equal the from-scratch spans")
    assert(emissions.map(_.size).sum == full.size,
      "emissions are disjoint — no span reported twice")
    assert(emissions.forall(_.nonEmpty), "every batch cut exercised")
    // at-least-once: a fully re-delivered batch emits nothing and
    // corrupts no state (a later fresh ingest still works)
    assert(s.ingest(batches(1)).isEmpty, "replayed batch fences to an empty emission")
    planted.unpersist(); ()
  }
}
