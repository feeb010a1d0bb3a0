package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ClassifierOps

/** Rocchio trained classifier: differential exactness of the closed-form
  * fit vs an independent plain-Scala implementation, the one-class empty
  * model contract, native DotFp kernel parity with the HOF fold, and the
  * train/apply split actually learning a held-out rule.
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = ClassifierOps.Scale

  /** Plain-Scala mirror of features + centroidTrain (truncating division
    * toward zero throughout, like Long `/`).
    */
  private def refFit(rows: Seq[(Long, Boolean, String)]): Map[Long, Long] = {
    def tok(t: String) = t.trim.split("\\s+").filter(_.nonEmpty)
    def feats(t: String): Array[Long] = {
      val nc = t.length.toLong
      val nt = tok(t).length.toLong
      val np = "[.,;:!?]".r.findAllIn(t).length.toLong
      val ns = "\\b(the|and|of|is|to|in|a)\\b".r.findAllIn(t.toLowerCase).length.toLong
      val nd = "[0-9]".r.findAllIn(t).length.toLong
      Array(S,
        math.min(nt * S / 200, S),
        math.min(np * 20 * S / math.max(nc, 1), S),
        math.min(ns * 5 * S / math.max(nt, 1), S),
        math.min(nd * 10 * S / math.max(nc, 1), S),
        math.min(nc * S / (math.max(nt, 1) * 10), S))
    }
    val data = rows.map { case (_, pos, t) => (if (pos) 1L else -1L, feats(t)) }
    val (posF, negF) = data.partition(_._1 == 1L)
    val mp = Array.tabulate(6)(j => posF.map(_._2(j)).sum / posF.size)
    val mn = Array.tabulate(6)(j => negF.map(_._2(j)).sum / negF.size)
    val w = Array.tabulate(6)(j => mp(j) - mn(j))
    val b = -(0 until 6).map(j => w(j) * (mp(j) + mn(j))).sum / 2
    val w2 = w.updated(0, w(0) + b / S)
    (1 to 6).map(j => j.toLong -> w2(j - 1)).toMap
  }

  private val fixture: Seq[(Long, Boolean, String)] = Seq.tabulate(60) { i =>
    // positives: longer, stopword-rich text; negatives: short and terse —
    // plus irregular punctuation/digits so every feature is exercised
    val pos = i % 3 != 0
    val words =
      if (pos) Seq.fill(8 + i % 11)(s"the data of run$i is in a table and")
      else Seq.fill(2 + i % 3)(s"x$i: 42, err!")
    (i.toLong, pos, words.mkString(" "))
  }

  test("centroidTrain matches the plain-Scala closed form exactly") {
    val df = fixture.toDF("id", "pos", "text")
    val got = ClassifierOps
      .centroidTrain(ClassifierOps.features(df, "id", "text", col("pos")), "id")
      .as[(Long, Long)].collect().toMap
    assert(got == refFit(fixture))
  }

  test("one-class input yields an empty model, not a wrong one") {
    val df = fixture.map { case (i, _, t) => (i, true, t) }.toDF("id", "pos", "text")
    val w = ClassifierOps
      .centroidTrain(ClassifierOps.features(df, "id", "text", col("pos")), "id")
    assert(w.count() == 0L)
    // and scoring with it fails LOUDLY instead of classifying everything
    // positive through the zero-length weight array
    val ex = intercept[IllegalArgumentException] {
      ClassifierOps.score(ClassifierOps.features(df, "id", "text", col("pos")), "id", w)
    }
    assert(ex.getMessage.contains("empty classifier model"))
  }

  test("DotFp kernel ≡ HOF fold on the feature/weight arrays") {
    val df = fixture.toDF("id", "pos", "text")
    val f = ClassifierOps.features(df, "id", "text", col("pos"))
    val w = ClassifierOps.centroidTrain(f, "id")
    val warr = w.orderBy("j").agg(collect_list(col("w_fp")).as("warr"))
    val both = f.join(broadcast(warr), lit(true))
      .select(
        graft.functions.VectorFunctions.graft_dotfp(col("x"), col("warr")).as("native"),
        aggregate(zip_with(col("x"), col("warr"), (a, b) => a * b), lit(0L), (acc, e) => acc + e)
          .as("hof"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty && both.forall { case (n, h) => n == h })
  }

  test("scoreWith scores genuinely UNLABELED features; the labeled wrapper agrees") {
    val df = fixture.toDF("id", "pos", "text")
    val labeled = ClassifierOps.features(df, "id", "text", col("pos"))
    val w = ClassifierOps.centroidTrain(labeled, "id")
    // the deployment shape: (id, x) only — no y column anywhere
    val unlabeled = labeled.select(col("id"), col("x"))
    val core = ClassifierOps.scoreWith(unlabeled, "id", w)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(core.length == fixture.length)
    // the eval wrapper's (score_fp, pred) legs are the SAME numbers
    val evald = ClassifierOps.score(labeled, "id", w)
      .select(col("id"), col("score_fp"), col("pred"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(core.sameElements(evald))
    // and carry rides a per-id-constant column through untouched
    val carried = ClassifierOps.scoreWith(labeled, "id", w, carry = Seq("y"))
    assert(carried.columns.toSeq == Seq("id", "score_fp", "pred", "y"))
    assert(carried.filter(col("y") =!= 1L && col("y") =!= -1L).count() == 0L)
  }

  test("stats fold is lossless: merged batch statistics reproduce the one-shot fit") {
    val df = fixture.toDF("id", "pos", "text")
    val feats = ClassifierOps.features(df, "id", "text", col("pos"))
    val oneShot = ClassifierOps.centroidTrain(feats, "id")
      .as[(Long, Long)].collect().toMap
    val folded = ClassifierOps.centroidFromStats(
      ClassifierOps.mergeCentroidStats(
        (0 to 2).map(m => ClassifierOps.centroidStats(feats.filter(col("id") % 3 === m))): _*))
      .as[(Long, Long)].collect().toMap
    assert(folded == oneShot)
  }

  test("nearestCentroid: plain-Scala differential and the lowest-label tie rule") {
    val df = fixture.toDF("id", "pos", "text")
    val tier = when(col("pos"), lit(2L)).otherwise(when(col("id") % 2 === 0, 0L).otherwise(1L))
    val feats = ClassifierOps.featuresLabeled(df, "id", "text", tier)
    val model = ClassifierOps.nearestCentroidTrain(feats)
    val got = ClassifierOps.nearestCentroidAssign(feats, "id", model)
      .as[(Long, Long, Long)].collect().map { case (i, p, d) => i -> ((p, d)) }.toMap
    // plain-Scala mirror over the collected features
    val rows = feats.as[(Long, Long, Seq[Long])].collect()
    val cents = rows.groupBy(_._2).map { case (l, rs) =>
      l -> (0 until 6).map(j => rs.map(_._3(j)).sum / rs.size)
    }
    val ref = rows.map { case (i, _, x) =>
      val scored = cents.toSeq.map { case (l, c) =>
        (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, l)
      }.minBy(identity) // (dist, label) — min dist, ties to lowest label
      i -> ((scored._2, scored._1))
    }.toMap
    assert(got == ref)
    // exact tie: two identical one-doc classes — prediction takes label 0
    val tie = Seq((1L, 0L, "same words here"), (2L, 1L, "same words here"))
      .toDF("id", "label", "text")
    val tf = ClassifierOps.featuresLabeled(tie, "id", "text", col("label"))
    val pred = ClassifierOps.nearestCentroidAssign(
      tf, "id", ClassifierOps.nearestCentroidTrain(tf))
      .as[(Long, Long, Long)].collect().map { case (i, p, d) => i -> ((p, d)) }.toMap
    assert(pred(1L) == ((0L, 0L)) && pred(2L) == ((0L, 0L)))
  }

  test("calibrateIsotonic equals floor-of-PAV (pooling replay) and is monotone; clamp edges covered") {
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random scores/labels, including values beyond
    // both clamp edges; label rate rises with score but NOT monotonically
    // per bin, so PAV genuinely pools
    val rows = (0 until 400).map { i =>
      val score = ((i * 2654435761L) % 1400L) - 200L // spans [-200, 1200) vs [0, 1000) bins
      val noise = (i * 40503L) % 100L
      val pos = noise < (20L + math.max(0L, math.min(score, 999L)) / 20L)
      (i.toLong, score, pos)
    }
    val (lo, hi, nBins) = (0L, 1000L, 10)
    val got = ClassifierOps.calibrateIsotonic(
      rows.toDF("id", "s", "y"), "s", "y", lo, hi, nBins)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // independent plain-Scala PAV: bin identically, pool adjacent
    // violators on EXACT rationals, floor each pooled average at the end
    def bin(s: Long): Long =
      if (s < lo) 0L else if (s >= hi) nBins - 1L else (s - lo) * nBins / (hi - lo)
    val hist = rows.groupBy(r => bin(r._2)).map { case (b, rs) =>
      (b, rs.size.toLong, rs.count(_._3).toLong)
    }.toSeq.sortBy(_._1)
    val pooled = hist.foldLeft(List.empty[(List[Long], Long, Long)]) {
      case (acc, (b, n, p)) =>
        var st = (List(b), n, p) :: acc
        while (st.lengthCompare(2) >= 0 && {
          val (_, n1, p1) = st.head; val (_, n0, p0) = st.tail.head
          p0 * n1 >= p1 * n0 // prev avg >= next avg → violator, pool
        }) {
          val (b1, n1, p1) = st.head; val (b0, n0, p0) = st.tail.head
          st = (b0 ++ b1, n0 + n1, p0 + p1) :: st.tail.tail
        }
        st
    }.reverse
    val exp = pooled.flatMap { case (bs, n, p) => bs.map(b => (b, p * 1000000L / n)) }.toMap
    assert(got.map(r => r._1 -> r._4).toMap == exp)
    assert(got.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "calibrated rates must be non-decreasing in bin")
    // both clamp bins exist (out-of-range scores landed there)
    assert(got.exists(_._1 == 0L) && got.exists(_._1 == (nBins - 1L)))
    assert(got.map(_._2).sum == 400L, "every row lands in exactly one bin")
  }

  test("train on half, score all: the learned midpoint rule generalizes") {
    val df = fixture.toDF("id", "pos", "text")
    val feats = ClassifierOps.features(df, "id", "text", col("pos"))
    val w = ClassifierOps.centroidTrain(feats.filter(col("id") % 2 === 0), "id")
    val scored = ClassifierOps.score(feats, "id", w)
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect()
    assert(scored.length == fixture.size)
    // correct column is internally consistent
    assert(scored.forall { case (_, s, pred, isPos, correct) =>
      pred == (s >= 0L) && correct == (pred == isPos)
    })
    // the held-out half classifies near-perfectly on this separable rule
    val held = scored.filter(_._1 % 2 == 1)
    assert(held.count(_._5) >= (held.length * 9) / 10)
  }
}
