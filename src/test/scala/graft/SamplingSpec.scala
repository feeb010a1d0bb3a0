package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SamplingOps

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private def docs = Tables.documents(spark, TestSpark.sf0001)

  test("hashSplit: total, deterministic, partition-invariant, ~requested fractions") {
    val ids = docs.select(col("doc_id"))
    val split = SamplingOps.hashSplit(ids, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("bucket").count().as[(String, Long)].collect().toMap
    val n = ids.count()
    assert(counts.values.sum == n) // total: every row lands in exactly one bucket
    assert(counts("train") > n * 6 / 10 && counts("train") < n)
    // partition-invariant: same assignment after a repartition
    val again = SamplingOps.hashSplit(
      ids.repartition(7), "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val first = split.as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("packSequences: per-shard spans are a gapless prefix-sum partition of the token stream") {
    val packed = SamplingOps.packSequences(docs, "doc_id", "text", chunkTokens = 512, nShards = 8)
      .select("doc_id", "shard", "n_tokens", "start_offset", "chunk_first", "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(packed.length == docs.count())
    packed.groupBy(_._2).values.foreach { shard =>
      val byId = shard.sortBy(_._1)
      // spans tile the shard stream: each doc starts where the previous ended
      assert(byId.head._4 == 0L)
      byId.zip(byId.tail).foreach { case (a, b) => assert(a._4 + a._3 == b._4) }
    }
    // chunk arithmetic: chunk_first/last bracket the span, n_chunks consistent
    packed.foreach { case (_, _, n, off, cf, cl, nc) =>
      assert(cf == off / 512 && cl == (off + n - 1) / 512 && nc == cl - cf + 1)
    }
    // deterministic under repartition
    val again = SamplingOps
      .packSequences(docs.repartition(5), "doc_id", "text", chunkTokens = 512, nShards = 8)
      .select("doc_id", "start_offset").as[(Long, Long)].collect().toMap
    assert(packed.map(p => p._1 -> p._4).toMap == again)
  }

  test("rebalanceDomains: limiting domain kept whole, others thinned toward target mix") {
    // A: 100 units at weight .5, B: 50 units at weight .5 → budget = 100,
    // keep_frac A = .5, B = 1.0 (B is the limiting domain)
    val rows = (1L to 100L).map(i => (i, "A", 1L)) ++ (101L to 150L).map(i => (i, "B", 1L)) ++
      Seq((999L, "junk", 1L)) // unweighted domain → dropped
    val df = rows.toDF("doc_id", "source", "n")
    val kept = SamplingOps.rebalanceDomains(df, "doc_id", "source", "n",
      Seq("A" -> 0.5, "B" -> 0.5))
      .select("doc_id", "source", "keep_frac").as[(Long, String, Double)].collect()
    val byDom = kept.groupBy(_._2)
    assert(!byDom.contains("junk"))
    assert(byDom("B").length == 50 && byDom("B").forall(_._3 == 1.0))
    assert(byDom("A").forall(_._3 == 0.5))
    val nA = byDom("A").length
    assert(nA > 30 && nA < 70, s"kept $nA of 100 at frac 0.5")
    // deterministic: identical kept set on a different partitioning
    val again = SamplingOps.rebalanceDomains(df.repartition(7), "doc_id", "source", "n",
      Seq("A" -> 0.5, "B" -> 0.5)).select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("stratifiedTake keeps exactly ceil(fraction*n) rows per stratum, deterministically") {
    val strata = docs.select(col("doc_id"), col("lang"))
    val take = SamplingOps.stratifiedTake(strata, Seq("lang"), "doc_id", 0.2)
    val got = take.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = strata.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(got(lang) == math.ceil(n * 0.2).toLong, s"$lang: ${got.get(lang)} of $n")
    }
    val again = SamplingOps.stratifiedTake(strata.repartition(5), Seq("lang"), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(again == take.select("doc_id").as[Long].collect().toSet)
  }

  test("shuffleShards: total, in-range, contiguous positions, partition-invariant, seed-sensitive") {
    val ids = docs.select(col("doc_id"))
    val n = ids.count()
    val sh = SamplingOps.shuffleShards(ids, "doc_id", nShards = 16, seed = "42")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(sh.length == n) // every row gets exactly one address
    assert(sh.forall(r => r._2 >= 0 && r._2 < 16))
    // positions within each shard are exactly 1..count(shard)
    sh.groupBy(_._2).values.foreach { s =>
      assert(s.map(_._3).sorted.toSeq == (1L to s.length).toSeq)
    }
    // a pure function of the row: same addresses on a different partitioning
    val again = SamplingOps.shuffleShards(ids.repartition(7), "doc_id", nShards = 16, seed = "42")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == sh.sortBy(_._1).toSeq)
    // the seed actually reshuffles: some address must change
    val reseeded = SamplingOps.shuffleShards(ids, "doc_id", nShards = 16, seed = "43")
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(reseeded.sortBy(_._1).toSeq != sh.sortBy(_._1).toSeq)
  }

  test("chunkDocs: exhaustive arithmetic pin over n=0..50 for six (chunk, stride) shapes") {
    // every branch of the chunk-count and token-count arithmetic, against a
    // model computed independently in plain Scala: nChunks, each chunk's
    // exact token slice, and full coverage of [0, n)
    val docs50 = (0L to 50L).map(n => (n, (1 to n.toInt).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    for ((w, s) <- Seq((1, 1), (4, 3), (5, 5), (8, 2), (20, 20), (7, 1))) {
      val got = SamplingOps.chunkDocs(docs50, "doc_id", "text", w, s)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      (0 to 50).foreach { n =>
        val toks = (1 to n).map(i => s"w$i")
        val expChunks = 1 + math.ceil(math.max(0, n - w) / s.toDouble).toInt
        val chunks = got(n.toLong)
        assert(chunks.length == expChunks, s"n=$n W=$w S=$s: ${chunks.length} != $expChunks")
        chunks.foreach { case (_, i, nTok, text) =>
          val expected = toks.slice(i.toInt * s, i.toInt * s + w)
          assert(text == expected.mkString(" "), s"n=$n W=$w S=$s chunk $i")
          assert(nTok == expected.length, s"n=$n W=$w S=$s chunk $i count")
        }
        // coverage: every token index lands in at least one chunk
        val covered = chunks.flatMap { case (_, i, nTok, _) =>
          (i.toInt * s) until (i.toInt * s + nTok.toInt) }.toSet
        assert(covered == (0 until n).toSet, s"n=$n W=$w S=$s coverage")
      }
    }
  }

  test("upsampleByWeight: floor(w) guaranteed, +1 at rate frac(w), deterministic, w=0 drops") {
    val d = (0L until 1000L).map(i => (i, 2.5)).toDF("doc_id", "weight")
    val up = SamplingOps.upsampleByWeight(d, "doc_id", "weight")
      .select("doc_id", "n_copies", "copy_idx").as[(Long, Long, Long)].collect()
    val byId = up.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byId.size == 1000 && byId.values.forall(n => n == 2 || n == 3))
    // copy_idx is exactly 1..n_copies per id
    up.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.head._2).toSeq)
    }
    // the +1 coin lands ~frac(w) of the time (frac = 0.5 here)
    val extra = byId.values.count(_ == 3)
    assert(extra > 400 && extra < 600, s"got $extra of 1000 at frac 0.5")
    // deterministic: identical expansion on a different partitioning
    val again = SamplingOps.upsampleByWeight(d.repartition(7), "doc_id", "weight")
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().toSet
    assert(again == up.map(r => (r._1, r._3)).toSet)
    // weight 0 drops the row entirely; integer weight is exact
    val mixed = Seq((1L, 0.0), (2L, 3.0)).toDF("doc_id", "weight")
    val got = SamplingOps.upsampleByWeight(mixed, "doc_id", "weight")
      .select("doc_id", "copy_idx").as[(Long, Long)].collect()
    assert(got.toSet == Set((2L, 1L), (2L, 2L), (2L, 3L)))
  }

  test("unit addressing stays collision-free at weight >= 10 (the doc_id*10 aliasing regime)") {
    // doc 5 copy 11 vs doc 6 copy 1 alias under unit_id = doc_id*10 + copy_idx;
    // the string address doc_id#copy_idx cannot collide for any weight
    val d = (1L to 20L).map(i => (i, 12.0)).toDF("doc_id", "weight")
    val units = SamplingOps.upsampleByWeight(d, "doc_id", "weight")
      .withColumn("unit_id", concat_ws("#", col("doc_id"), col("copy_idx")))
    val total = units.count()
    assert(total == 20L * 12L)
    assert(units.select("unit_id").distinct().count() == total, "unit ids collided")
    // and the full shard address space stays total: every unit lands exactly once
    val sharded = SamplingOps.shuffleShards(units, "unit_id", nShards = 16, seed = "mix")
    assert(sharded.count() == total)
    assert(sharded.select("unit_id").distinct().count() == total)
    // per-shard positions remain contiguous 1..n under the string key
    val byShard = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(byShard.forall { case (_, n, mx, mn) => mn == 1L && mx == n })
  }

  test("capPerDomain keeps exactly the top-k per domain with deterministic tie order") {
    val d = Seq(
      ("a.com", 1L, 100L), ("a.com", 2L, 300L), ("a.com", 3L, 300L), ("a.com", 4L, 50L),
      ("b.com", 5L, 10L)).toDF("source", "doc_id", "n_chars")
    val got = SamplingOps.capPerDomain(d, "source", "doc_id", "n_chars", 2)
      .select("source", "doc_id", "domain_rank")
      .as[(String, Long, Long)].collect().toSet
    // ties on score break to the lower id: 2 then 3; 1 (rank 3) is cut
    assert(got == Set(("a.com", 2L, 1L), ("a.com", 3L, 2L), ("b.com", 5L, 1L)))
  }

  test("lengthBuckets: integer-exact bucket assignment, padding and overflow accounting") {
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val d = Seq(
      (1L, doc(32)),   // exactly at a bound → that bucket, zero pad
      (2L, doc(33)),   // one over → next bucket, pad 31
      (3L, ""),        // empty → 0 tokens → smallest bucket, pad 32
      (4L, doc(2049))  // over the top bound → overflow bucket
    ).toDF("doc_id", "text")
    val got = SamplingOps.lengthBuckets(d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(32L) == ((2L, 32L, 32L, 0L)))   // docs 1+3: 32+0 tokens, pad 0+32
    assert(got(64L) == ((1L, 33L, 31L, 0L)))
    assert(got(-1L) == ((1L, 2049L, 0L, 1L)))  // truncation cost 2049-2048
  }

  test("chunkDocs: stride coverage, overlap, tail and empty-doc contracts") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, W=4 S=3 → 1+ceil(6/3)=3 chunks
      (2L, "a b"),                                    // shorter than one window → 1 chunk
      (3L, "   "),                                    // empty → one empty chunk
      (4L, (1 to 9).map(i => s"s$i").mkString(" "))   // SHORT TAIL: i=2 chunk has 3 of 4 tokens
    ).toDF("doc_id", "text")
    val got = SamplingOps.chunkDocs(d, "doc_id", "text", chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._4).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.forall(_._3 == 4L))
    // every source token is covered by at least one chunk
    assert(d1.flatMap(_._4.split(" ")).toSet == (1 to 10).map(i => s"t$i").toSet)
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "a b")))
    assert(got.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 0L, "")))
    // short final chunk of a multi-chunk doc: the one branch where the
    // arithmetic token count (least/greatest on i·stride) differs from
    // chunkTokens — 9 tokens → chunks at 1,4,7 with the tail holding 3
    assert(got.filter(_._1 == 4L).toSeq == Seq(
      (4L, 0L, 4L, "s1 s2 s3 s4"),
      (4L, 1L, 4L, "s4 s5 s6 s7"),
      (4L, 2L, 3L, "s7 s8 s9")))
  }

  test("clusterSplit: near-dup families never straddle splits; doc-keyed split does") {
    import graft.ops.DedupOps
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs for the test to bite")
    val cc = DedupOps.connectedComponents(
      DedupOps.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5), "doc_a", "doc_b")
    val labels = docs.select(col("doc_id"))
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val byCluster = SamplingOps.clusterSplit(labels, "doc_id", "cluster_id", fr)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(byCluster.size == docs.count(), "split is total")
    pairs.foreach { case (a, b) =>
      assert(byCluster(a) == byCluster(b), s"pair ($a,$b) straddles cluster split")
    }
    // the hazard is real on this corpus: the doc-keyed split strands at
    // least one near-dup pair across buckets (deterministic md5 check)
    val byDoc = SamplingOps.hashSplit(docs.select(col("doc_id")), "doc_id", fr)
      .as[(Long, String)].collect().toMap
    assert(pairs.exists { case (a, b) => byDoc(a) != byDoc(b) },
      "doc-keyed split should straddle at least one near-dup pair here")
  }

  test("prioritySample matches a plain-Scala reference; scale-invariant; weight-biased") {
    val rows = (0L until 400L).map(i => (i, s"s${i % 3}", (i % 37) + 1L))
    val df = rows.toDF("id", "stratum", "w")
    def refTop(k: Int, scale: Long): Map[String, Seq[(Long, Double)]] =
      rows.map { case (id, s, w0) =>
        val w = w0 * scale
        val h = (id * 1103515245L + 12345L) % 2147483648L
        (s, id, (w.toDouble * 2147483648.0) / (h + 1L))
      }.groupBy(_._1).view.mapValues(
        _.sortBy { case (_, id, p) => (-p, id) }.take(k).map(t => (t._2, t._3)).toSeq).toMap

    val got = SamplingOps.prioritySample(df, "id", "w", Seq("stratum"), k = 10)
      .select("stratum", "id", "priority", "rank")
      .as[(String, Long, Double, Long)].collect().toSeq
    val gotBy = got.groupBy(_._1).view.mapValues(
      _.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap
    assert(gotBy == refTop(10, 1L), "exact priority and selection parity with the reference")

    // scale invariance: doubling every weight reselects the same ids
    val scaled = SamplingOps.prioritySample(
      df.withColumn("w", col("w") * 2), "id", "w", Seq("stratum"), k = 10)
      .select("stratum", "id").as[(String, Long)].collect().toSet
    assert(scaled == got.map(t => (t._1, t._2)).toSet)

    // weight bias: mean weight of the selected rows exceeds the population mean
    val selW = got.map(t => rows(t._2.toInt)._3)
    assert(selW.sum.toDouble / selW.size > rows.map(_._3).sum.toDouble / rows.size,
      "heavier rows are selected preferentially")

    // the portability contract is enforced, not just documented: an id
    // outside [0, 2^33) or a negative weight would silently diverge from
    // the oracle (engine-dependent 64-bit wrap / inverted top-k), so the
    // operator fails loudly instead of sampling wrong
    def mustRaise(data: Seq[(Long, String, Long)]): Unit = {
      val e = intercept[Exception] {
        SamplingOps.prioritySample(
          data.toDF("id", "stratum", "w"), "id", "w", Seq("stratum"), k = 5).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("portability contract")), s"unexpected error: $e")
    }
    mustRaise(Seq((-1L, "s0", 3L)))
    mustRaise(Seq((8589934592L, "s0", 3L)))
    mustRaise(Seq((7L, "s0", -2L)))
  }
}
