package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, GraphOps}

/** Graph operators over pair relations: label-propagation communities and
  * triangle/clustering stats, pinned on a hand-computed bridged-triangles
  * graph where LPA and connected components must DISAGREE.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4
  private def bridged = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L),
    (3L, 4L)).toDF("doc_a", "doc_b")

  test("labelPropagation keeps bridged dense communities apart (hand-computed rounds); CC merges them") {
    val got = GraphOps.labelPropagation(bridged, "doc_a", "doc_b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    // synchronous rounds, weight-argmax with min-label ties, traced by hand:
    // r1: {1:2, 2:1, 3:1, 4:3, 5:4, 6:4}
    // r2: {1:1, 2:1, 3:1, 4:4, 5:3, 6:3}
    // r3: {1:1, 2:1, 3:1, 4:3, 5:3, 6:3}
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(got.values.toSet.size == 2, "the bridge must not merge the communities")
    val cc = DedupOps.connectedComponents(bridged, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1, "CC on the same graph merges across the bridge")
  }

  test("triangleStats: exact degree/triangles/lcc on the bridged graph") {
    val got = GraphOps.triangleStats(bridged, "doc_a", "doc_b")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val third = 2.0 * 1.0 / (3 * 2).toDouble
    assert(got == Map(
      1L -> ((2L, 1L, Some(1.0))),
      2L -> ((2L, 1L, Some(1.0))),
      3L -> ((3L, 1L, Some(third))),
      4L -> ((3L, 1L, Some(third))),
      5L -> ((2L, 1L, Some(1.0))),
      6L -> ((2L, 1L, Some(1.0)))))
  }

  test("triangleStats: degree-1 node has NULL lcc and zero triangles") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)).toDF("doc_a", "doc_b")
    val got = GraphOps.triangleStats(g, "doc_a", "doc_b")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(9L) == ((1L, 0L, None)))
    assert(got(3L)._1 == 3L && got(3L)._2 == 1L)
  }

  test("kCore: cascade peeling on a hand-built lollipop; fixpoint reached within the round budget") {
    // triangle {1,2,3} with a tail 3-7-8-9: the tail peels back one node
    // per round (9 first, then 8, then 7 — a CASCADE, so one round of
    // degree filtering is provably not enough), the triangle survives
    val lollipop = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 7L), (7L, 8L), (8L, 9L)).toDF("doc_a", "doc_b")
    val got = GraphOps.kCore(lollipop, "doc_a", "doc_b", k = 2, rounds = 8)
      .as[(Long, Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, true, Some(2L))))
    assert(got(2L) == ((2L, true, Some(2L))))
    assert(got(3L) == ((3L, true, Some(2L)))) // raw degree 3, core degree 2
    assert(got(7L) == ((2L, false, None)))    // degree 2 raw, but peels in the cascade
    assert(got(8L) == ((2L, false, None)))
    assert(got(9L) == ((1L, false, None)))
    // too few rounds must NOT reach the fixpoint on the cascade — pins
    // that the registered 8-round form actually needed its iteration
    val shallow = GraphOps.kCore(lollipop, "doc_a", "doc_b", k = 2, rounds = 2)
      .as[(Long, Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(shallow(7L), "after 2 rounds the cascade has not yet peeled node 7")
  }

  test("kCore: registered 8-round form is the exact fixpoint on the shipped pair graph (round 7 == round 8)") {
    Seq(TestSpark.sf0001, TestSpark.sf001).foreach { sf =>
      val pairs = SparkEntry.neardupArtifactForTest(spark, sf)
      val r7 = GraphOps.kCore(pairs, "doc_a", "doc_b", k = 2, rounds = 7)
      val r8 = GraphOps.kCore(pairs, "doc_a", "doc_b", k = 2, rounds = 8)
      assert(r7.exceptAll(r8).isEmpty && r8.exceptAll(r7).isEmpty,
        s"peeling must have converged within 7 rounds at $sf")
    }
  }

  test("pageRank matches a plain-Scala fixed-point replay; bridge nodes out-rank leaves") {
    val got = GraphOps.pageRank(bridged, "doc_a", "doc_b", rounds = 5)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // independent plain-Scala replay of the integer recurrence
    val und = bridged.as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val w = und.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wdeg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = und.map(_._1).distinct.map(_ -> 1000000L).toMap
    (1 to 5).foreach { _ =>
      r = und.distinct.groupBy(_._2).map { case (v, ins) =>
        val c = ins.map { case (u, _) => r(u) * w((u, v)) / wdeg(u) }.sum
        v -> (150000L + 85L * c / 100L)
      }
    }
    assert(got == r.map { case (n, rk) => n -> ((rk, wdeg(n))) })

    // structure: the bridge endpoints (degree 3) carry more authority
    // than the pure triangle corners (degree 2); mass stays bounded by
    // the initial |nodes|·1e6 (truncation only ever bleeds mass)
    assert(got(3L)._1 > got(1L)._1 && got(4L)._1 > got(6L)._1)
    assert(got.values.map(_._1).sum <= 6L * 1000000L)
    assert(got.values.forall(_._1 >= 150000L))
  }
}
