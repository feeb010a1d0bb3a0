package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

/** Geometry contracts of the multimodal 1→N generator stages: the
  * declarative metadata-driven forms (frameGeometry / audioWindowGeometry)
  * must compute the SAME fan-out arithmetic as the codec-probed
  * mapPartitions samplers (sampleFrames / sampleAudioWindows), and both
  * must honor the clipping/cap/edge contracts.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def packed(kind: String) = MultimodalOps.packBinary(
    Tables.documents(spark, TestSpark.sf0001), "doc_id", "text", kind)

  test("frameGeometry == sampleFrames fan-out when fed the sampler's own stub durations") {
    val p = packed("video").cache()
    // re-derive each record's stub duration driver-side from the same bytes
    val durations = p.select("media_id", "payload").as[(Long, Array[Byte])].collect()
      .map { case (id, bytes) =>
        val (checksum, _, _) = MultimodalOps.decodeStub(bytes)
        (id, 500L + math.abs(checksum % 8000L))
      }.toSeq.toDF("media_id", "duration_ms")
    val geo = MultimodalOps.frameGeometry(p.join(durations, "media_id"), "duration_ms")
      .select("media_id", "frame_idx", "ts_ms")
      .as[(Long, Long, Long)].collect().toSet
    val sampled = MultimodalOps.sampleFrames(spark, p)
      .select(col("media_id"), col("frame_idx").cast("long"), col("ts_ms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(geo == sampled, "declarative geometry diverged from the mapPartitions sampler")
  }

  test("audioWindowGeometry == sampleAudioWindows spans when fed the sampler's stub durations") {
    val p = packed("audio").cache()
    val durations = p.select("media_id", "payload").as[(Long, Array[Byte])].collect()
      .map { case (id, bytes) =>
        val (checksum, _, _) = MultimodalOps.decodeStub(bytes)
        (id, 1000L + math.abs(checksum % 30000L))
      }.toSeq.toDF("media_id", "duration_ms")
    val geo = MultimodalOps.audioWindowGeometry(p.join(durations, "media_id"), "duration_ms")
      .select("media_id", "window_idx", "start_ms", "end_ms")
      .as[(Long, Long, Long, Long)].collect().toSet
    val sampled = MultimodalOps.sampleAudioWindows(spark, p)
      .select(col("media_id"), col("window_idx").cast("long"), col("start_ms"), col("end_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(geo == sampled, "declarative geometry diverged from the mapPartitions sampler")
  }

  test("frameGeometry edge contracts: cap, sub-interval clip, zero and negative durations") {
    val m = Seq((1L, 100000L), (2L, 999L), (3L, 0L), (4L, -5L), (5L, 3500L))
      .toDF("media_id", "duration_ms")
    val got = MultimodalOps.frameGeometry(m, "duration_ms", everyMs = 1000L, maxFrames = 8)
      .select("media_id", "frame_idx", "ts_ms", "n_frames")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    assert(got(1L).length == 8 && got(1L).map(_._4).forall(_ == 8L)) // capped at maxFrames
    assert(got(2L).toSeq == Seq((2L, 0L, 0L, 1L)))  // shorter than interval → one frame at t=0
    assert(got(3L).toSeq == Seq((3L, 0L, 0L, 1L)))  // empty clip still yields its t=0 frame
    assert(got(4L).toSeq == Seq((4L, 0L, 0L, 1L)))  // malformed metadata clamps, no task error
    assert(got(5L).map(r => (r._2, r._3)).sorted.toSeq ==
      Seq((0L, 0L), (1L, 1000L), (2L, 2000L), (3L, 3000L)))
  }

  test("audioWindowGeometry edge contracts: overlap, last-window clip, cap, degenerate durations") {
    val m = Seq((1L, 5500L), (2L, 1500L), (3L, 0L), (4L, 100000L))
      .toDF("media_id", "duration_ms")
    val got = MultimodalOps
      .audioWindowGeometry(m, "duration_ms", windowMs = 2000L, hopMs = 1000L, maxWindows = 16)
      .select("media_id", "window_idx", "start_ms", "end_ms")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    // duration 5500: (5500-2000)/1000+1 = 4 windows at 0..3000, none hit the clip
    assert(got(1L).map(r => (r._2, r._3, r._4)).sorted.toSeq ==
      Seq((0L, 0L, 2000L), (1L, 1000L, 3000L), (2L, 2000L, 4000L), (3L, 3000L, 5000L)))
    assert(got(2L).toSeq == Seq((2L, 0L, 0L, 1500L)))  // d <= window → one clipped window
    assert(got(3L).toSeq == Seq((3L, 0L, 0L, 0L)))     // empty clip → one empty window
    assert(got(4L).length == 16)                        // capped at maxWindows
    // overlap contract: consecutive windows share windowMs - hopMs = 1000ms
    val w1 = got(1L).sortBy(_._2)
    assert(w1.zip(w1.tail).forall { case (a, b) => b._3 - a._3 == 1000L })
  }
}
