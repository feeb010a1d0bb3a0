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

  // ---- REAL image codec path (javax.imageio — the JDK's own PNG codec) ----

  test("real PNG round trip: decoded dims and channel sums equal the closed form, including odd heights and 1px strips") {
    // crafted geometries: odd/even heights (band split), 1-row, 1-col
    val cases = Seq((7L, 5, 4), (8L, 3, 5), (9L, 1, 9), (10L, 6, 1))
    val rows = cases.map { case (id, w, h) =>
      val top = 0xFF8040; val bot = 0x102030
      MultimodalOps.MediaRecord(id, "image", 0L, MultimodalOps.renderPng(w, h, top, bot))
    }
    val got = MultimodalOps.decodeImageFeatures(spark, rows.toDF())
      .collect().map(f => f.media_id -> f).toMap
    cases.foreach { case (id, w, h) =>
      val f = got(id)
      assert(f.decode_ok && f.width == w && f.height == h)
      val (tRows, bRows) = (h / 2, h - h / 2)
      assert(f.sum_r == w.toLong * (tRows * 0xFF + bRows * 0x10), s"sum_r id=$id")
      assert(f.sum_g == w.toLong * (tRows * 0x80 + bRows * 0x20), s"sum_g id=$id")
      assert(f.sum_b == w.toLong * (tRows * 0x40 + bRows * 0x30), s"sum_b id=$id")
    }
  }

  test("corrupt/truncated/non-image payloads land as decode_ok=false rows — the scan never dies") {
    val png = MultimodalOps.renderPng(6, 4, 0xAABBCC, 0x112233)
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, "image", 0L, png),
      MultimodalOps.MediaRecord(2L, "image", 0L, "not an image at all".getBytes("UTF-8")),
      MultimodalOps.MediaRecord(3L, "image", 0L, java.util.Arrays.copyOf(png, 11)),
      MultimodalOps.MediaRecord(4L, "image", 0L, Array.empty[Byte]))
    val got = MultimodalOps.decodeImageFeatures(spark, rows.toDF())
      .collect().map(f => f.media_id -> f.decode_ok).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("resizeImages: box-fit geometry, never upscales, and the re-encoded payload is a REAL decodable PNG") {
    val solid = 0x3C96C8
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, "image", 0L, MultimodalOps.renderPng(40, 20, solid, solid)),
      MultimodalOps.MediaRecord(2L, "image", 0L, MultimodalOps.renderPng(5, 3, solid, solid)),
      MultimodalOps.MediaRecord(3L, "image", 0L, "junk".getBytes("UTF-8")))
    val out = MultimodalOps.resizeImages(spark, rows.toDF(), maxDim = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(1L).resized && out(1L).width == 16 && out(1L).height == 8) // downscaled
    assert(out(2L).resized && out(2L).width == 5 && out(2L).height == 3)  // never upscale
    assert(!out(3L).resized && out(3L).payload.sameElements("junk".getBytes("UTF-8")))
    // two real codec passes: decode the resized payload again — solid color
    // survives any interpolation kernel exactly
    val back = MultimodalOps.decodeImageFeatures(spark,
      Seq(MultimodalOps.MediaRecord(1L, "image", 0L, out(1L).payload)).toDF())
      .collect().head
    assert(back.decode_ok && back.width == 16 && back.height == 8)
    assert(back.sum_r == 0x3CL * 16 * 8 && back.sum_g == 0x96L * 16 * 8 &&
      back.sum_b == 0xC8L * 16 * 8)
  }

  test("real WAV round trip: decoded windows carry sample-exact energy; header fields parse; corrupt audio screens") {
    // crafted tone: 700 samples ±1234, period 20 → windows at 256/128:
    // nw = (700-256)/128 + 1 = 4, last clipped to 700 - 3*128 = 316 → 256? no:
    // len(w) = min(256, 700 - w*128) → 256, 256, 256, 172 (wait w=3: 700-384=316 → 256)
    val wav = MultimodalOps.renderWavSquare(700, 1234, 20)
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, "audio", 0L, wav),
      MultimodalOps.MediaRecord(2L, "audio", 0L, "definitely not RIFF".getBytes("UTF-8")))
    val got = MultimodalOps.decodeAudioFeatures(spark, rows.toDF())
      .collect().groupBy(_.media_id)
    val ws = got(1L).sortBy(_.window_idx)
    assert(ws.forall(w => w.decode_ok && w.sample_rate == 8000L && w.n_total == 700L))
    assert(ws.map(_.window_idx).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(ws.map(_.n_samples).toSeq == Seq(256L, 256L, 256L, 256L))
    assert(ws.forall(w => w.sum_abs == 1234L * w.n_samples && w.peak == 1234L))
    // the undecodable payload is screened as one flagged row, never dropped
    assert(got(2L).toSeq.map(w => (w.decode_ok, w.sum_abs)) == Seq((false, 0L)))
  }

  test("renderTestTones params match the q_audio_decode oracle's id arithmetic; last window clips exactly") {
    val ids = Seq(0L, 1L, 955L, 1199L, 1200L, 54321L).toDF("doc_id")
    val got = MultimodalOps.decodeAudioFeatures(spark,
      MultimodalOps.renderTestTones(spark, ids, "doc_id"))
      .collect().groupBy(_.media_id)
    got.foreach { case (id, ws) =>
      val (n, amp, _) = MultimodalOps.toneParams(id)
      val nw = math.min(8, (n - 256) / 128 + 1)
      assert(ws.length == nw, s"window count id=$id")
      ws.foreach { w =>
        val len = math.min(256, n - w.window_idx * 128)
        assert(w.decode_ok && w.n_total == n && w.n_samples == len &&
          w.sum_abs == amp.toLong * len && w.peak == amp.toLong, s"window $w id=$id")
      }
    }
  }

  test("real GIF container round trip: frame count, per-frame dims and channel sums exact; corrupt video screens; maxFrames caps") {
    val colors = Seq(0xFF0000, 0x00A050, 0x0000FF, 0x7F7F7F, 0x010203)
    val gif = MultimodalOps.renderGif(9, 6, colors)
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, "video", 0L, gif),
      MultimodalOps.MediaRecord(2L, "video", 0L, "GIF89a-but-not-really".getBytes("UTF-8")))
    val got = MultimodalOps.decodeVideoFrames(spark, rows.toDF(), maxFrames = 8)
      .collect().groupBy(_.media_id)
    val fs = got(1L).sortBy(_.frame_idx)
    assert(fs.length == 5 && fs.forall(f => f.decode_ok && f.n_frames == 5L &&
      f.width == 9L && f.height == 6L))
    fs.zip(colors).foreach { case (f, c) =>
      assert(f.sum_r == 54L * ((c >> 16) & 0xFF) && f.sum_g == 54L * ((c >> 8) & 0xFF) &&
        f.sum_b == 54L * (c & 0xFF), s"frame ${f.frame_idx}")
    }
    assert(got(2L).toSeq.map(f => (f.decode_ok, f.n_frames)) == Seq((false, 0L)))
    // the frame budget truncates the decode, not the container's count
    val capped = MultimodalOps.decodeVideoFrames(
      spark, Seq(MultimodalOps.MediaRecord(1L, "video", 0L, gif)).toDF(), maxFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(capped.length == 3 && capped.forall(_.n_frames == 5L))
  }

  test("renderTestClips params match the q_video_frames oracle's id arithmetic") {
    val ids = Seq(0L, 1L, 6L, 255L, 256L, 9999L).toDF("doc_id")
    val got = MultimodalOps.decodeVideoFrames(spark,
      MultimodalOps.renderTestClips(spark, ids, "doc_id"))
      .collect().groupBy(_.media_id)
    got.foreach { case (id, fs) =>
      val (w, h, nf) = MultimodalOps.clipParams(id)
      assert(fs.length == nf, s"frame count id=$id")
      fs.foreach { f =>
        val c = MultimodalOps.clipFrameColor(id, f.frame_idx.toInt)
        assert(f.decode_ok && f.width == w && f.height == h &&
          f.sum_r == w.toLong * h * ((c >> 16) & 0xFF) &&
          f.sum_g == w.toLong * h * ((c >> 8) & 0xFF) &&
          f.sum_b == w.toLong * h * (c & 0xFF), s"frame $f id=$id")
      }
    }
  }

  test("renderTestCards geometry/colors match the registered oracles' id arithmetic") {
    val ids = Seq(0L, 1L, 16L, 254L, 255L, 256L, 12345L).toDF("doc_id")
    val feats = MultimodalOps.decodeImageFeatures(spark,
      MultimodalOps.renderTestCards(spark, ids, "doc_id"))
      .collect().map(f => f.media_id -> f).toMap
    feats.foreach { case (id, f) =>
      val (w, h) = MultimodalOps.cardDims(id, solid = false)
      assert(f.decode_ok && f.width == w && f.height == h, s"dims id=$id")
      val (tRows, bRows) = (h / 2, h - h / 2)
      def c(m: Int) = (id * m % 256).toInt
      assert(f.sum_r == w.toLong * (tRows * c(37) + bRows * c(101)), s"sum_r id=$id")
      assert(f.sum_g == w.toLong * (tRows * c(59) + bRows * c(131)), s"sum_g id=$id")
      assert(f.sum_b == w.toLong * (tRows * c(83) + bRows * c(151)), s"sum_b id=$id")
    }
  }

  test("imageRasterDedup: PNG/BMP byte-different payloads dedupe on decoded raster; file digest finds nothing") {
    val cards = Seq(0L, 1L, 7L, 255L, 256L, 12345L)
    val png = cards.map(c => (c, c)).toDF("media_id", "card_id")
    val bmp = cards.map(c => (c + 1000L, c)).toDF("media_id", "card_id")
    val packed = MultimodalOps.renderTestCardsEnc(spark, png, "media_id", "card_id", "png")
      .unionByName(MultimodalOps.renderTestCardsEnc(spark, bmp, "media_id", "card_id", "bmp"))
      .cache()
    // the motivating differential: the PNG and BMP payloads of the same
    // card share ZERO file digests (container bytes differ)...
    val fileDigests = packed.select(md5(col("payload")).as("d"))
      .groupBy("d").count().filter(col("count") > 1).count()
    assert(fileDigests == 0L, "file-level digests must NOT collide across containers")
    // ...but every card's two rows share one raster digest
    val out = MultimodalOps.imageRasterDedup(
      MultimodalOps.rasterHex(spark, packed).toDF())
      .select("media_id", "raster_md5", "keeper_id", "n_copies", "is_dup")
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(out.length == cards.size * 2)
    assert(out.forall(_._4 == 2L), s"every card must have exactly 2 copies: ${out.take(4).toSeq}")
    cards.foreach { c =>
      val pair = out.filter(r => r._1 == c || r._1 == c + 1000L)
      assert(pair.map(_._2).distinct.length == 1, s"raster digests differ for card $c")
      assert(pair.forall(_._3 == c), s"keeper must be the lowest media_id for card $c")
      assert(pair.map(_._5).sorted.toSeq == Seq(false, true), s"one keeper one dup for card $c")
    }
    // corrupt payloads screen, never kill, and never join a dup group
    val corrupt = Seq((99999L, "image", 3L, Array[Byte](1, 2, 3))).toDF(
      "media_id", "kind", "n_bytes", "payload")
    val withBad = MultimodalOps.rasterHex(spark, packed.unionByName(corrupt)).toDF()
    assert(withBad.filter(!col("decode_ok")).count() == 1L)
    assert(MultimodalOps.imageRasterDedup(withBad).count() == cards.size * 2L)
  }
}
