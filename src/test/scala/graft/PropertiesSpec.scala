package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, Incremental, Merge}

/** Property-based checks (SURVEY §5's upgrade over the reference's
  * example-based tests): algebraic invariants of merge/gap/jaccard operators
  * over generated inputs. Generators are driven directly from ScalaCheck
  * with a fixed seed (deterministic; no scalatest bridge in the offline
  * dependency set).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default.withSize(30)
    Iterator
      .iterate((Seed(42L), Option.empty[A])) { case (s, _) =>
        (s.next, Some(g.pureApply(params, s)))
      }
      .drop(1).take(n).flatMap(_._2).toSeq
  }

  private val tickGen: Gen[List[(String, Double, Long)]] = Gen.listOf(
    for {
      sym <- Gen.oneOf("A", "B", "C", "D")
      price <- Gen.choose(1.0, 1000.0)
      v <- Gen.choose(1L, 50L)
    } yield (sym, price, v)).suchThat(_.nonEmpty)

  test("property: graft_ngram_hashes equals the HOF build on random token arrays, all n") {
    // "e e" (embedded space) exercises that hashing runs over the joined
    // STRING either way; "δδ" exercises multi-byte UTF-8
    val tokGen: Gen[List[String]] = Gen.listOf(
      Gen.oneOf("a", "bb", "ccc", "δδ", "e e", "x", ""))
    samples(tokGen, 12).foreach { toks =>
      val df = Seq(Tuple1(toks)).toDF("toks")
      for (n <- 1 to 4) {
        import graft.functions.HashFunctions.graft_ngram_hashes
        val native = df.select(graft_ngram_hashes(col("toks"), n).as("g"))
          .as[Seq[Long]].head()
        val hof = df.select(
          when(size(col("toks")) >= n,
            transform(sequence(lit(1), size(col("toks")) - lit(n - 1)),
              i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(n))))))
            .otherwise(array().cast("array<bigint>")).as("g"))
          .as[Seq[Long]].head()
        assert(native == hof, s"n=$n toks=$toks")
        // the distinct form preserves first-occurrence order like array_distinct
        val natD = df.select(graft_ngram_hashes(col("toks"), n, distinct = true).as("g"))
          .as[Seq[Long]].head()
        assert(natD == hof.distinct, s"distinct n=$n toks=$toks")
      }
    }
  }

  test("property: graft_top_count equals the max group size of the array, any multiset") {
    val hGen: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 6L))
    samples(hGen, 20).foreach { hs =>
      val df = Seq(Tuple1(hs)).toDF("hs")
      val got = df.select(graft.functions.HashFunctions.graft_top_count(col("hs")).as("t"))
        .as[Long].head()
      val expect = if (hs.isEmpty) 0L else hs.groupBy(identity).values.map(_.size).max.toLong
      assert(got == expect, s"hs=$hs")
    }
  }

  test("property: lastWins is idempotent and re-delivery-insensitive") {
    samples(tickGen, 8).foreach { ticks =>
      val df = ticks.toDF("symbol", "price", "v")
      // (sym, v) can collide with different prices — price is the tiebreaker
      val order = Seq(col("v"), col("price"))
      val once = Merge.lastWins(df, Seq("symbol"), order)
      val a = once.collect().toSet
      assert(Merge.lastWins(once, Seq("symbol"), order).collect().toSet == a)
      assert(Merge.upsert(once, df, Seq("symbol"), order).collect().toSet == a)
      assert(once.groupBy("symbol").count().filter(col("count") > 1).count() == 0)
    }
  }

  test("property: upsert of the two slices is insensitive to slice order") {
    samples(Gen.zip(tickGen, tickGen), 6).foreach { case (xs, ys) =>
      val a = xs.toDF("symbol", "price", "v")
      val b = ys.toDF("symbol", "price", "v")
      val order = Seq(col("v"), col("price"))
      val ab = Merge.upsert(a, b, Seq("symbol"), order).collect().toSet
      val ba = Merge.upsert(b, a, Seq("symbol"), order).collect().toSet
      assert(ab == ba)
    }
  }

  test("property: gap detection partitions the spine (missing + covered = spine)") {
    val covGen = Gen.listOf(for {
      sym <- Gen.oneOf("X", "Y")
      m <- Gen.choose(0, 11)
    } yield (sym, java.sql.Date.valueOf(f"2024-${m + 1}%02d-15")))
    samples(covGen, 8).foreach { cov =>
      val requested = Seq("X", "Y").toDF("symbol")
      val stored = cov.toDF("symbol", "d")
      val gaps = Incremental
        .gapDetection(
          requested, stored, Seq("symbol"), "d",
          lit("2024-01-01").cast("date"), lit("2024-12-01").cast("date"))
        .select("symbol", "missing_months").as[(String, Long)].collect().toMap
      val coveredMonths =
        cov.groupBy(_._1).view.mapValues(_.map(_._2.toString.substring(0, 7)).toSet.size).toMap
      Seq("X", "Y").foreach { s =>
        assert(gaps.getOrElse(s, 0L) + coveredMonths.getOrElse(s, 0) == 12L, s"symbol $s")
      }
    }
  }

  test("property: connectedComponents labels equal the true component minimum") {
    val edgeGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    samples(edgeGen, 6).foreach { edges =>
      val got = DedupOps.connectedComponents(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      // reference union-find on the driver
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = verts.map { v =>
        v -> verts.filter(u => find(u) == find(v)).min
      }.toMap
      assert(got == expected)
    }
  }

  test("property: asofJoin equals the brute-force greatest-prior-right lookup") {
    import graft.ops.Analytics
    val lGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L)))
    val rGen = Gen.listOfN(15, for {
      k <- Gen.chooseNum(0L, 3L); ts <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(1, 999)
    } yield (k, ts, v.toDouble))
    samples(Gen.zip(lGen, rGen), 6).foreach { case (ls, rs0) =>
      // right side unique per (k, ts) — the operator's tie contract
      val rs = rs0.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val l = ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("k", "ts", "lid")
      val r = rs.toDF("k", "ts", "v")
      val got = Analytics.asofJoin(l, r, Seq("k"), "ts", "v")
        .select("lid", "asof_v").as[(Long, Option[Double])].collect().toMap
      val expected = ls.zipWithIndex.map { case ((k, ts), i) =>
        i.toLong -> rs.filter(x => x._1 == k && x._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == expected, s"left=$ls right=$rs")
    }
  }

  test("property: connectedComponentsFast labels equal the min-label version on random graphs") {
    val edgeGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    samples(edgeGen, 6).foreach { edges =>
      val df = edges.toDF("doc_a", "doc_b")
      val slow = DedupOps.connectedComponents(df, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      val fast = DedupOps.connectedComponentsFast(df, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(fast == slow, s"edge set: $edges")
    }
  }

  test("connectedComponentsFast: long path converges in O(log n) rounds where min-label needs O(n)") {
    // a 128-node path is the adversarial-diameter case: min-label moves the
    // component minimum ONE hop per round, star contraction halves the
    // chain — O(log n) rounds with generous slack
    val n = 128
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (_, rounds, converged) = DedupOps.alternatingStarRounds(chain, "doc_a", "doc_b", 50)
    assert(converged)
    info(s"alternating star rounds on a $n-path: $rounds")
    assert(rounds <= 14, s"expected O(log n) rounds, got $rounds")
    val labels = DedupOps.connectedComponentsFast(chain, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(labels.length == n && labels.forall(_._2 == 0L))
    // min-label given the same round budget has NOT finished propagating —
    // and must FAIL LOUD rather than return silently mislabeled components
    assertThrows[IllegalStateException] {
      DedupOps.connectedComponents(chain, "doc_a", "doc_b", maxIter = rounds)
    }
  }

  test("connectedComponents: a chain beyond the OLD 25-round budget converges under the default") {
    // regression guard for the round-5 default (25): a 40-doc chain-shaped
    // near-dup component needs ~39 min-label rounds — real corpora produce
    // such chains (each doc near-dups its neighbors only), and the operator
    // must label them, not crash. The 100-round default covers it; truly
    // unbounded diameters still fail loudly (previous test).
    val n = 40
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = DedupOps.connectedComponents(chain, "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(labels.length == n && labels.forall(_._2 == 0L))
  }

  test("property: packSequences spans tile each shard stream exactly") {
    val docGen = Gen.listOfN(20, Gen.chooseNum(1, 40)).map { lens =>
      lens.zipWithIndex.map { case (len, i) =>
        (i.toLong, (1 to len).map(j => s"t$j").mkString(" "))
      }
    }
    samples(docGen, 5).foreach { docs =>
      val packed = graft.ops.SamplingOps
        .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text", 7, 3)
        .select("doc_id", "shard", "n_tokens", "start_offset", "chunk_first", "chunk_last")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      packed.groupBy(_._2).values.foreach { sh =>
        val byId = sh.sortBy(_._1)
        assert(byId.head._4 == 0L)
        byId.zip(byId.tail).foreach { case (a, b) => assert(a._4 + a._3 == b._4) }
        // token mass conservation: last doc's end == shard total
        assert(byId.last._4 + byId.last._3 == sh.map(_._3).sum)
      }
      packed.foreach { case (_, _, n, off, cf, cl) =>
        assert(cf == off / 7 && cl == (off + n - 1) / 7)
      }
    }
  }

  test("property: z-values interleave exactly and share prefixes within aligned tiles") {
    import graft.ops.Layout
    // known interleavings: x occupies even bits, y odd bits
    val known = Seq((0L, 0L, 0L), (3L, 0L, 5L), (0L, 3L, 10L), (1L, 1L, 3L), (65535L, 0L, 0x55555555L))
    val kdf = known.toDF("x", "y", "expect")
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
    assert(kdf.filter(col("z") =!= col("expect")).count() == 0)
    // locality: all 16 points of any 4x4 tile aligned at multiples of 4
    // collapse to one value after dropping the low 4 interleaved bits
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)).toDF("x", "y")
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
      .withColumn("tile", call_function("shiftright", col("z"), lit(4)))
      .withColumn("bx", floor(col("x") / 4) * 4).withColumn("by", floor(col("y") / 4) * 4)
    val perBox = grid.groupBy("bx", "by").agg(countDistinct(col("tile")).as("nt"))
    assert(perBox.filter(col("nt") =!= 1).count() == 0)
  }

  test("property: merged partial aggregates equal the full-scan aggregate for any split") {
    import graft.ops.Analytics
    val rowGen = Gen.listOfN(40, for {
      k <- Gen.chooseNum(0L, 5L)
      v <- Gen.chooseNum(1, 99999).map(_ / 100.0)
      s <- Gen.chooseNum(0, 2)
    } yield (k, v, s)).suchThat(_.nonEmpty)
    samples(rowGen, 6).foreach { rows =>
      val df = rows.toDF("k", "v", "slice")
      val parts = (0 to 2).map(s => Analytics.partialAgg(
        df.filter(col("slice") === s), Seq("k"), "v"))
      val merged = Analytics.mergePartialAggs(parts, Seq("k"))
        .select(col("k"), col("n"), col("__total").cast("double"))
        .as[(Long, Long, Double)].collect().toSet
      val full = Analytics.partialAgg(df, Seq("k"), "v")
        .select(col("k"), col("n"), col("__total").cast("double"))
        .as[(Long, Long, Double)].collect().toSet
      assert(merged == full)
    }
  }

  test("property: applyCdc is idempotent under change-stream re-delivery") {
    val changeGen = Gen.listOfN(15, for {
      sym <- Gen.oneOf("A", "B", "C")
      price <- Gen.choose(1.0, 100.0)
      v <- Gen.choose(1L, 9L)
      del <- Gen.oneOf(true, false)
    } yield (sym, price, v, if (del) "D" else "U")).suchThat(_.nonEmpty)
    samples(Gen.zip(tickGen, changeGen), 5).foreach { case (snapTicks, chRows) =>
      val snapshot = Merge.lastWins(
        snapTicks.toDF("symbol", "price", "v"), Seq("symbol"), Seq(col("v"), col("price")))
      val changes = chRows.toDF("symbol", "price", "v", "op")
      // ties on (v, price) between a D and U row of the same key would make
      // the winner op ambiguous — disambiguate the order by op as well
      val order = Seq(col("v"), col("price"), col("op"))
      val once = Merge.applyCdc(snapshot, changes, Seq("symbol"), order, "op")
      val again = Merge.applyCdc(once, changes, Seq("symbol"), order, "op")
      assert(again.collect().toSet == once.collect().toSet,
        "re-delivering the same change stream must not change the store")
      assert(once.groupBy("symbol").count().filter(col("count") > 1).count() == 0)
    }
  }

  test("property: jaccard pairs are bounded, canonical and complete on identical docs") {
    val docGen = Gen.listOfN(8, Gen.chooseNum(0, 3)).map { seeds =>
      seeds.zipWithIndex.map { case (s, i) =>
        (i.toLong, (0 to 6).map(j => s"w${(s + j) % 9}").mkString(" "))
      }
    }
    samples(docGen, 6).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val pairs = DedupOps.jaccardPairs(df, "doc_id", "text", 3, 0.0)
        .as[(Long, Long, Double)].collect()
      assert(pairs.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 })
      val identical = docs.groupBy(_._2).values.filter(_.size > 1)
        .flatMap(g => g.map(_._1).sorted.combinations(2).map(c => (c(0), c(1)))).toSet
      val found = pairs.filter(_._3 == 1.0).map(p => (p._1, p._2)).toSet
      assert(identical.subsetOf(found))
    }
  }

  test("property: temperatureAllocation sums to slots exactly and stays within one of quota") {
    import graft.ops.SamplingOps
    val mixGen: Gen[List[Int]] =
      Gen.nonEmptyListOf(Gen.choose(1, 500)).map(_.take(12))
    samples(mixGen, 12).zipWithIndex.foreach { case (sizes, it) =>
      val slots = 97L + it * 31L  // vary the slot count too, off round numbers
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map(i => (s * 100000L + i, s"src$s"))
      }.toDF("doc_id", "source")
      val got = SamplingOps.temperatureAllocation(docs, "source", slots)
        .select("source", "n_docs", "w", "alloc")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got.map(_._4).sum == slots, s"iteration $it: allocation must sum to $slots")
      // Hamilton stays within 1 of the real (rational) quota
      val tw = got.map(_._3).sum
      got.foreach { case (s, _, w, alloc) =>
        val quota = w.toDouble * slots / tw
        assert(alloc >= quota.floor - 1e-9 && alloc <= quota.ceil + 1e-9,
          s"iteration $it: $s alloc $alloc outside [floor,ceil] of quota $quota")
      }
    }
  }

  test("property: prioritySample per-stratum selection equals the reference top-k for random data") {
    import graft.ops.SamplingOps
    val rowsGen: Gen[List[(Long, String, Long)]] = Gen.nonEmptyListOf(
      for {
        id <- Gen.choose(0L, 4000000000L)  // exercises ids up to the 2^33 contract bound
        s <- Gen.oneOf("x", "y")
        w <- Gen.choose(0L, 5000000L)
      } yield (id, s, w)).map(_.distinctBy(_._1))
    samples(rowsGen, 10).foreach { rows =>
      val df = rows.toDF("id", "stratum", "w")
      val got = SamplingOps.prioritySample(df, "id", "w", Seq("stratum"), k = 5)
        .select("stratum", "id").as[(String, Long)].collect().toSet
      val expect = rows.map { case (id, s, w0) =>
        val h = (id * 1103515245L + 12345L) % 2147483648L
        (s, id, (w0.toDouble * 2147483648.0) / (h + 1L))
      }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy { case (_, id, p) => (-p, id) }.take(5).map(t => (t._1, t._2))
      }.toSet
      assert(got == expect)
    }
  }

  test("property: jaccardPairsPrefix equals jaccardPairs on random near-dup corpora") {
    val corpusGen: Gen[List[(Long, String)]] = for {
      base <- Gen.nonEmptyListOf(
        Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")).map(_.mkString(" ")))
      n = base.take(12)
    } yield n.zipWithIndex.flatMap { case (t, i) =>
      // each doc plus a perturbed twin → guaranteed near-dup structure
      Seq((i * 2L, t), (i * 2L + 1L, t + " hh"))
    }
    samples(corpusGen, 8).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val full = DedupOps.jaccardPairs(df, "doc_id", "text", 2, 0.5)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val pref = DedupOps.jaccardPairsPrefix(df, "doc_id", "text", 2, 0.5)
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(pref == full)
    }
  }

  test("property: graft_l2sq equals a plain-Scala fold on random long arrays, incl. ragged") {
    import graft.functions.VectorFunctions.graft_l2sq
    val vecGen: Gen[(List[Long], List[Long])] = for {
      n <- Gen.choose(0, 12)
      m <- Gen.choose(0, 12)
      a <- Gen.listOfN(n, Gen.choose(-2000000L, 2000000L))
      b <- Gen.listOfN(m, Gen.choose(-2000000L, 2000000L))
    } yield (a, b)
    samples(vecGen, 40).foreach { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft_l2sq(col("a"), col("b"))).as[Long].collect().head
      val exp = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(got == exp, s"a=$a b=$b")
    }
  }

  test("property: debounceConsecutive is idempotent for any event stream") {
    val evGen: Gen[List[(Long, Option[String])]] = Gen.listOf(
      for {
        u <- Gen.choose(1L, 3L)
        t <- Gen.option(Gen.oneOf("A", "B"))
      } yield (u, t)).suchThat(_.nonEmpty)
    samples(evGen, 15).foreach { evs =>
      val df = evs.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, t) }
        .toDF("user_id", "seq", "event_type")
      val once = Merge.debounceConsecutive(df, Seq("user_id"), Seq(col("seq")), Seq("event_type"))
      val twice = Merge.debounceConsecutive(
        once.drop("run_seq"), Seq("user_id"), Seq(col("seq")), Seq("event_type"))
      val a = once.select("user_id", "seq").as[(Long, Long)].collect().toSet
      val b = twice.select("user_id", "seq").as[(Long, Long)].collect().toSet
      assert(a == b, s"debounce must be idempotent on $evs")
      // every input row's value survives somewhere: the kept rows cover all runs
      val runs = evs.zipWithIndex.groupBy { case ((u, _), _) => u }.values.map { rows =>
        rows.map { case ((_, t), _) => t }.foldLeft(List.empty[Option[String]]) {
          case (acc, t) if acc.headOption.contains(t) => acc
          case (acc, t) => t :: acc
        }.size
      }.sum
      assert(a.size == runs, "kept rows == total run count across users")
    }
  }

  test("property: kmvMerge of any split equals the from-scratch sketch, estimates included") {
    import graft.ops.Analytics
    val valGen: Gen[List[(String, Long)]] = Gen.listOf(
      for {
        g <- Gen.oneOf("g1", "g2")
        v <- Gen.choose(1L, 500L)
      } yield (g, v)).suchThat(_.nonEmpty)
    samples(valGen, 10).foreach { rows =>
      val df = rows.toDF("g", "v")
      val k = 16
      val scratch = Analytics.kmvSketch(df, Seq("g"), "v", k)
      // arbitrary overlapping 3-way split
      val parts = Seq(
        df.filter(col("v") % 3 === 0 || col("v") < 50),
        df.filter(col("v") % 3 === 1 || col("v") > 400),
        df.filter(col("v") % 3 === 2 || (col("v") >= 50 && col("v") <= 400)))
        .map(p => Analytics.kmvSketch(p, Seq("g"), "v", k))
      val merged = Analytics.kmvMerge(k, parts: _*)
      val a = scratch.select("g", "hv", "pos").as[(String, Long, Long)].collect().toSet
      val b = merged.select("g", "hv", "pos").as[(String, Long, Long)].collect().toSet
      assert(a == b, s"kmv merge must equal scratch on $rows")
    }
  }

  test("property: ewmaResume at ANY pivot stitches to the from-scratch trajectory") {
    import graft.ops.Analytics
    val serGen: Gen[List[Double]] = Gen.listOf(Gen.choose(1.0, 500.0)).suchThat(_.size >= 2)
    samples(serGen, 5).foreach { vals =>
      def d(i: Int) = java.sql.Date.valueOf(f"2024-01-${i + 1}%02d")
      val df = vals.take(28).zipWithIndex.map { case (v, i) => (1L, d(i), v) }
        .toDF("symbol", "date", "price")
      val full = Analytics.ewmaFixedPoint(df, "symbol", "date", "price")
        .select("date", "ewma_fp").as[(java.sql.Date, Long)].collect().toSet
      val n = math.min(vals.size, 28)
      for (pivot <- 1 until n by 7) {
        val pd = d(pivot)
        val pre = Analytics.ewmaFixedPoint(
          df.filter(col("date") < lit(pd)), "symbol", "date", "price")
        val state = pre.groupBy(col("symbol"))
          .agg(max_by(col("ewma_fp"), col("date")).as("ewma_fp"))
        val post = Analytics.ewmaResume(
          df.filter(col("date") >= lit(pd)), "symbol", "date", "price", state)
        val stitched = pre.unionByName(post)
          .select("date", "ewma_fp").as[(java.sql.Date, Long)].collect().toSet
        assert(stitched == full, s"pivot $pivot on ${vals.take(28)}")
      }
    }
  }

  test("property: the shingle-bank streaming fold equals from-scratch CC at any batch split") {
    // the algebraic core of Streaming.NearDupClusterStream, property-tested
    // without the streaming machinery: fold random doc corpora through
    // pairsFromShingleBank + mergeClusters in 1-4 random batches and the
    // final labeling must equal the one-shot jaccardPairs + CC (uncapped —
    // the configuration whose equality is unconditional)
    val wordPool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docGen: Gen[List[(Long, String)]] = for {
      nFam <- Gen.choose(1, 3)
      fams <- Gen.listOfN(nFam, Gen.listOfN(8, Gen.oneOf(wordPool)).map(_.mkString(" ")))
      docs <- Gen.listOf(for {
        id <- Gen.choose(0L, 40L)
        fam <- Gen.oneOf(fams)
        extra <- Gen.listOfN(2, Gen.oneOf(wordPool))
      } yield (id, s"$fam ${extra.mkString(" ")}"))
        .suchThat(_.nonEmpty)
    } yield docs.distinctBy(_._1)
    samples(docGen, 8).zipWithIndex.foreach { case (docs, i) =>
      val all = docs.toDF("doc_id", "text")
      val expected = all.select(col("doc_id").as("id"))
        .join(
          DedupOps.connectedComponents(
            DedupOps.jaccardPairs(all, "doc_id", "text", n = 3,
              threshold = 0.5, maxDocFreq = 0),
            "doc_a", "doc_b"),
          Seq("id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
        .as[(Long, Long)].collect().toSet
      val nBatches = 1 + i % 4
      val batches = docs.grouped(math.max(1, (docs.size + nBatches - 1) / nBatches)).toSeq
      var bank = Option.empty[org.apache.spark.sql.DataFrame]
      var labels = Option.empty[org.apache.spark.sql.DataFrame]
      batches.foreach { b =>
        val sh = DedupOps.hashedShingles(
          b.toDF("doc_id", "text"), "doc_id", "text", 3).localCheckpoint(true)
        val (bp, cp) = DedupOps.pairsFromShingleBank(
          bank.getOrElse(sh.limit(0)), sh, "doc_id", 0.5, hot = None)
        val seeded = labels.fold(
          sh.select(col("doc_id").as("id"), col("doc_id").as("cluster_id")))(
          _.unionByName(sh.select(col("doc_id").as("id"), col("doc_id").as("cluster_id"))))
        labels = Some(DedupOps.mergeClusters(
          seeded,
          bp.select(col("doc_a"), col("doc_b"))
            .unionByName(cp.select(col("doc_a"), col("doc_b")))).localCheckpoint(true))
        bank = Some(bank.fold(sh)(_.unionByName(sh).localCheckpoint(true)))
      }
      val got = labels.get.select(col("id"), col("cluster_id"))
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"case $i: ${docs.size} docs in $nBatches batches")
      spark.catalog.clearCache()
    }
  }

  test("property: audit monoids — any batch split folds to the one-shot scorecard") {
    import graft.ops.AuditOps
    val rowGen: Gen[List[(Long, Option[Double], Long)]] = Gen.listOf(
      for {
        id <- Gen.choose(0L, 30L)
        v <- Gen.option(Gen.choose(-10.0, 10.0))
        fk <- Gen.choose(0L, 6L)
      } yield (id, v, fk)).suchThat(_.nonEmpty)
    val parent = Seq(0L, 1L, 2L, 3L).toDF("pk")
    val checks = Seq(
      "v_positive" -> !(col("v") > 0),
      "v_complete" -> col("v").isNull)
    samples(rowGen, 8).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "v", "fk")
      val nBatches = 1 + (rows.size % 3)
      val batches = (0 until nBatches).map(m => df.filter(pmod(col("id"), lit(nBatches)) === m))
      def card(d: org.apache.spark.sql.DataFrame) =
        d.select("check_name", "violations", "total", "pass")
          .as[(String, Long, Long, Boolean)].collect().toSet
      assert(
        card(AuditOps.mergeRowAudits(batches.map(AuditOps.auditRows(_, "t", checks)): _*)) ==
          card(AuditOps.auditRows(df, "t", checks)),
        s"case $i rows")
      val foldedCounts = AuditOps.mergeKeyCounts(Seq("id"))(
        batches.map(AuditOps.keyCounts(_, Seq("id"))): _*)
      assert(
        card(AuditOps.auditUniqueFromCounts(foldedCounts, "t", "pk")) ==
          card(AuditOps.auditUnique(df, "t", Seq("id"), "pk")),
        s"case $i unique")
      val foldedFk = AuditOps.mergeKeyCounts(Seq("fk"))(
        batches.map(AuditOps.keyCounts(_, Seq("fk"))): _*)
      assert(
        card(AuditOps.auditReferentialFromCounts(
          foldedFk, "t", Seq("fk" -> "pk"), parent, "fk")) ==
          card(AuditOps.auditReferential(df, "t", Seq("fk" -> "pk"), parent, "fk")),
        s"case $i referential")
      spark.catalog.clearCache()
    }
  }

  test("property: cluster-aware split leaks ZERO pairs for ANY pair graph") {
    import graft.ops.{DedupOps, SamplingOps}
    // the structural claim behind q_split_leakage's cluster leg: a pair's
    // endpoints share a connected component, components are assigned
    // atomically, so NO pair can straddle buckets — for any graph, any
    // fraction vector, including bridge chains and isolated nodes
    val pairGen: Gen[List[(Long, Long)]] = Gen.listOf(
      for {
        a <- Gen.choose(0L, 25L)
        b <- Gen.choose(0L, 25L) if a != b
      } yield (math.min(a, b), math.max(a, b))).suchThat(_.nonEmpty)
    val splits = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    samples(pairGen, 8).zipWithIndex.foreach { case (ps, i) =>
      val pairs = ps.toDF("doc_a", "doc_b")
      val docs = (0L to 25L).toDF("doc_id")
      val labels = docs
        .join(
          DedupOps.connectedComponents(pairs, "doc_a", "doc_b")
            .withColumnRenamed("id", "doc_id"),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val assign = SamplingOps.clusterSplit(labels, "doc_id", "cluster_id", splits)
        .select(col("doc_id"), col("bucket"))
      val straddling = pairs
        .join(assign.select(col("doc_id").as("doc_a"), col("bucket").as("ba")), "doc_a")
        .join(assign.select(col("doc_id").as("doc_b"), col("bucket").as("bb")), "doc_b")
        .filter(col("ba") =!= col("bb"))
        .count()
      assert(straddling == 0L, s"case $i: $straddling straddling pairs")
      spark.catalog.clearCache()
    }
  }

  test("property: paretoFrontier2 equals the naive O(n²) dominance filter on random points") {
    import graft.ops.SamplingOps
    // x straddles both clamp edges of the [0, 100) × 4-bucket geometry;
    // duplicate coordinates occur (small domains) and must ALL be kept
    val rowGen: Gen[List[(Long, Option[Long], Option[Long])]] = Gen.listOf(
      for {
        x <- Gen.option(Gen.choose(-20L, 130L))
        y <- Gen.option(Gen.choose(-10L, 10L))
      } yield (0L, x, y)).suchThat(_.exists(r => r._2.isDefined && r._3.isDefined))
    samples(rowGen, 8).zipWithIndex.foreach { case (rows0, i) =>
      val rows = rows0.zipWithIndex.map { case ((_, x, y), j) => (j.toLong, x, y) }
      val df = rows.toDF("id", "x", "y")
      val got = SamplingOps.paretoFrontier2(df, "id", "x", "y", 0L, 100L, 4)
        .as[(Long, Long, Long)].collect().toSet
      val pts = rows.collect { case (id, Some(x), Some(y)) => (id, x, y) }
      val exp = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, bx, by) => bx >= x && by >= y && (bx > x || by > y) }
      }.toSet
      assert(got == exp, s"case $i: got ${got.toSeq.sorted}\nexp ${exp.toSeq.sorted}")
      // skyline fold monoid: frontier of the batch frontiers' union ==
      // the full frontier, for any disjoint split
      val nb = 1 + (rows.size % 3)
      val parts = (0 until nb).map(m => SamplingOps.paretoFrontier2(
        df.filter(pmod(col("id"), lit(nb)) === m), "id", "x", "y", 0L, 100L, 4))
      val folded = SamplingOps.paretoFrontier2(
        parts.reduce(_ unionByName _), "id", "x", "y", 0L, 100L, 4)
        .as[(Long, Long, Long)].collect().toSet
      assert(folded == exp, s"case $i fold: got ${folded.toSeq.sorted}")
      // keyed single-pass form (the r13 q_pareto_incremental plan) ==
      // the union of per-batch frontiers, batch by batch
      val keyed = SamplingOps.paretoFrontier2Keyed(
        df.withColumn("__m", pmod(col("id"), lit(nb))),
        Seq("__m"), "id", "x", "y", 0L, 100L, 4)
        .select(col("id"), col("x"), col("y"))
        .as[(Long, Long, Long)].collect().toSet
      val unioned = parts.map(_.as[(Long, Long, Long)].collect().toSet).reduce(_ union _)
      assert(keyed == unioned, s"case $i keyed: got ${keyed.toSeq.sorted}")
      spark.catalog.clearCache()
    }
  }

  test("property: count-min sketch — fold ≡ one-shot, est >= exact, exact at collision-free width") {
    import graft.ops.Analytics
    val (depth, width) = (3, 16) // narrow on purpose: collisions MUST occur
    val rowGen: Gen[List[(Long, String, Option[Long])]] = Gen.listOf(
      for {
        id <- Gen.choose(0L, 40L)
        k <- Gen.oneOf("a", "b")
        // negative values and NULLs ride along; values collide in 16 slots
        v <- Gen.option(Gen.choose(-30L, 30L))
      } yield (id, k, v)).suchThat(_.exists(_._3.isDefined))
    def est(sketch: org.apache.spark.sql.DataFrame, probes: org.apache.spark.sql.DataFrame,
        w: Int) =
      Analytics.cmsEstimate(sketch, probes, Seq("k"), "v", depth, w)
        .as[(String, Long, Long)].collect().map { case (k, v, e) => ((k, v), e) }.toMap
    samples(rowGen, 8).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "k", "v")
      val oneShot = est(Analytics.cmsSketch(df, Seq("k"), "v", depth, width), df, width)
      val nBatches = 1 + (rows.size % 3)
      val batches = (0 until nBatches).map(m => df.filter(pmod(col("id"), lit(nBatches)) === m))
      val folded = est(
        Analytics.cmsMerge(Seq("k"))(
          batches.map(Analytics.cmsSketch(_, Seq("k"), "v", depth, width)): _*),
        df, width)
      assert(folded == oneShot, s"case $i fold")
      // over-estimate bound: est >= exact for every probed value…
      val exact = rows.collect { case (_, k, Some(v)) => (k, v) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      oneShot.foreach { case ((k, v), e) =>
        assert(e >= exact((k, v)), s"case $i: est $e < exact for ($k, $v)")
      }
      assert(oneShot.keySet == exact.keySet, s"case $i probe domain")
      // …and with a width no 61 distinct values can collide in, est == exact
      val wide = est(Analytics.cmsSketch(df, Seq("k"), "v", depth, 1 << 20), df, 1 << 20)
      assert(wide == exact, s"case $i exact at wide width")
      spark.catalog.clearCache()
    }
  }

  test("property: histogram-sketch quantiles — any batch split folds to the one-shot estimates") {
    import graft.ops.Analytics
    val (lo, hi, nBins) = (0L, 100L, 10)
    val qs = Seq(250, 500, 900, 1000)
    val rowGen: Gen[List[(Long, String, Option[Long])]] = Gen.listOf(
      for {
        id <- Gen.choose(0L, 40L)
        k <- Gen.oneOf("a", "b")
        // values straddle both clamp edges (negatives and >= hi) and NULL
        v <- Gen.option(Gen.choose(-20L, 130L))
      } yield (id, k, v)).suchThat(_.exists(_._3.isDefined))
    def est(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "q_permille", "n_total", "est")
        .as[(String, Long, Long, Long)].collect().toSet
    samples(rowGen, 8).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "k", "v")
      val oneShot = Analytics.quantilesFromCounts(
        Analytics.histogramFixed(df, Seq("k"), "v", lo, hi, nBins),
        Seq("k"), qs, lo, hi, nBins)
      val nBatches = 1 + (rows.size % 3)
      val batches = (0 until nBatches).map(m => df.filter(pmod(col("id"), lit(nBatches)) === m))
      val folded = Analytics.quantilesFromCounts(
        Analytics.mergeHistogramCounts(Seq("k"))(
          batches.map(Analytics.histogramFixed(_, Seq("k"), "v", lo, hi, nBins)): _*),
        Seq("k"), qs, lo, hi, nBins)
      assert(est(folded) == est(oneShot), s"case $i fold")
      // sketch sanity against the exact quantile: the estimate's bin
      // contains a value at or above the target rank, so est (the bin's
      // UPPER edge) is >= the exact q-quantile clamped into [lo, hi]
      val exact = rows.collect { case (_, k, Some(v)) => (k, math.max(lo, math.min(hi - 1, v))) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      est(oneShot).foreach { case (k, q, n, e) =>
        val vs = exact(k)
        assert(n == vs.size, s"case $i count for $k")
        val target = ((n * q + 999) / 1000).toInt
        assert(e >= vs(target - 1), s"case $i est $e < exact ${vs(target - 1)} for ($k, $q)")
        assert(e - vs(target - 1) <= (hi - lo) / nBins, s"case $i error > one bin for ($k, $q)")
      }
      spark.catalog.clearCache()
    }
  }

  test("property: histogram drift — any batch split folds to the one-shot contributions") {
    import graft.ops.Analytics
    val (lo, hi, nBins) = (0L, 100L, 10)
    val rowGen: Gen[List[(Long, String, Option[Long])]] = Gen.listOf(
      for {
        id <- Gen.choose(0L, 40L)
        g <- Gen.oneOf("web", "books", "code")
        // values straddle both clamp edges (negatives and >= hi) and NULL
        v <- Gen.option(Gen.choose(-20L, 130L))
      } yield (id, g, v)).suchThat(_.exists(_._3.isDefined))
    def drift(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "bin", "c_g", "c_r", "contrib_fp")
        .as[(String, Long, Long, Long, Long)].collect().toSet
    samples(rowGen, 8).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "g", "v")
      val oneShot = Analytics.histogramDriftByGroup(df, "g", "v", lo, hi, nBins)
      val nBatches = 1 + (rows.size % 3)
      val batches = (0 until nBatches).map(m => df.filter(pmod(col("id"), lit(nBatches)) === m))
      val folded = Analytics.driftFromCounts(
        Analytics.mergeHistogramCounts(Seq("g"))(
          batches.map(Analytics.histogramFixed(_, Seq("g"), "v", lo, hi, nBins)): _*),
        "g", nBins)
      val os = drift(oneShot)
      assert(drift(folded) == os, s"case $i fold")
      // KL sanity: the per-group total is the smoothed KL(group ‖ corpus),
      // non-negative up to per-bin rounding (each bin rounds to micro-nats
      // independently, so the floor is -nBins/2 micro-nats, not 0)
      os.groupBy(_._1).foreach { case (g, bins) =>
        assert(bins.size == nBins, s"case $i dense domain for $g")
        assert(bins.toSeq.map(_._5).sum >= -(nBins / 2).toLong, s"case $i KL < rounding floor for $g")
      }
      spark.catalog.clearCache()
    }
  }

  test("property: charEntropy native kernel ≡ HOF fold ≡ plain Scala on random unicode text") {
    import graft.ops.TextOps
    // alphabet spans ASCII, BMP accents, and SUPPLEMENTARY-plane emoji —
    // codepoint counting must not split surrogate pairs; wide alphabets
    // force the kernel's open-address map through its rehash path
    val cpGen = Gen.frequency(
      6 -> Gen.choose('a'.toInt, 'z'.toInt),
      2 -> Gen.oneOf('é'.toInt, 'ü'.toInt, 'ß'.toInt, '中'.toInt),
      1 -> Gen.oneOf(0x1F600, 0x1F680, 0x10348),
      3 -> Gen.choose(0x100, 0x2FF)) // 512-codepoint band → rehash at 64 uniques
    val docGen = Gen.listOfN(4, Gen.nonEmptyListOf(cpGen)
      .map(_.flatMap(Character.toChars(_).toSeq).mkString))
    def refEntropy(t: String): (Long, Long, Long) = {
      val cps = t.codePoints().toArray
      val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
      val n = cps.length.toLong
      val sumFp = counts.values.map(c => math.round(c.toDouble * math.log(c.toDouble) * 1e6)).sum
      (n, counts.size.toLong, math.round(math.log(n.toDouble) * 1e6) - sumFp / n)
    }
    samples(docGen, 8).zipWithIndex.foreach { case (texts, i) =>
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      def run(native: Boolean) = TextOps.charEntropy(docs, "doc_id", "text", native = native)
        .select("doc_id", "n_chars_seen", "n_unique_chars", "entropy_fp")
        .as[(Long, Long, Long, Long)].collect().toSet
      val nat = run(native = true)
      assert(run(native = false) == nat, s"case $i native vs HOF")
      val want = texts.zipWithIndex.map { case (t, j) =>
        val (n, u, h) = refEntropy(t); (j.toLong, n, u, h)
      }.toSet
      assert(nat == want, s"case $i vs plain Scala")
    }
  }

  test("property: pageRank equals a plain-Scala integer replay on any pair graph") {
    import graft.ops.GraphOps
    // random multigraphs: parallel pairs (weight > 1), self-contained
    // components, chains — the replay must match bit-for-bit everywhere
    val pairGen: Gen[List[(Long, Long)]] = Gen.listOf(
      for {
        a <- Gen.choose(0L, 15L)
        b <- Gen.choose(0L, 15L) if a != b
      } yield (a, b)).suchThat(_.nonEmpty)
    samples(pairGen, 8).zipWithIndex.foreach { case (ps, i) =>
      val rounds = 1 + (i % 4)
      val got = GraphOps.pageRank(ps.toDF("doc_a", "doc_b"), "doc_a", "doc_b", rounds)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val und = ps.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val w = und.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val wdeg = und.groupBy(_._1).view.mapValues(vs => vs.map(_ => 1L).sum).toMap
      var r = und.map(_._1).distinct.map(_ -> 1000000L).toMap
      (1 to rounds).foreach { _ =>
        r = und.distinct.groupBy(_._2).map { case (v, ins) =>
          v -> (150000L + 85L * ins.map { case (u, _) => r(u) * w((u, v)) / wdeg(u) }.sum / 100L)
        }
      }
      assert(got == r.map { case (n, rk) => n -> ((rk, wdeg(n))) }, s"case $i rounds=$rounds")
      // mass never inflates (truncation only bleeds), floor is the teleport
      assert(got.values.map(_._1).sum <= r.size * 1000000L, s"case $i mass")
      assert(got.values.forall(_._1 >= 150000L), s"case $i floor")
      spark.catalog.clearCache()
    }
  }

  test("property: rrfFuse is symmetric in run order and exact in fixed point") {
    import graft.ops.TextOps
    val runGen: Gen[List[(Long, Long, Long)]] = Gen.listOf(
      for {
        q <- Gen.choose(1L, 4L)
        d <- Gen.choose(10L, 25L)
        r <- Gen.choose(1L, 10L)
      } yield (q, d, r)).suchThat(_.nonEmpty)
    samples(Gen.zip(runGen, runGen), 8).zipWithIndex.foreach { case ((ra, rb), i) =>
      // dedupe (q, d) within a run: a run is a ranking, one rank per doc
      def clean(rs: List[(Long, Long, Long)]) =
        rs.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq.toDF("q", "d", "r")
      val (a, b) = (clean(ra), clean(rb))
      def fuse(runs: Seq[org.apache.spark.sql.DataFrame]) =
        TextOps.rrfFuse(runs, "q", "d", "r", k = 5)
          .select("query_id", "doc_id", "rrf_fp", "n_runs", "rank")
          .as[(Long, Long, Long, Long, Long)].collect().toSet
      val ab = fuse(Seq(a, b))
      assert(ab == fuse(Seq(b, a)), s"case $i: fusion must not depend on run order")
      // per-row exactness vs a plain-Scala fold
      val expected = (a.as[(Long, Long, Long)].collect() ++ b.as[(Long, Long, Long)].collect())
        .groupBy(t => (t._1, t._2))
        .map { case ((q, d), rs) => (q, d, rs.map(t => 1000000L / (60L + t._3)).sum, rs.size.toLong) }
      expected.groupBy(_._1).foreach { case (q, rows) =>
        val top = rows.toSeq.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((qq, d, s, n), idx) => (qq, d, s, n, idx + 1L) }.toSet
        assert(ab.filter(_._1 == q) == top, s"case $i query $q")
      }
      spark.catalog.clearCache()
    }
  }
}
