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
}
