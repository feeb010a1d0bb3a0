package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{DedupOps, SimilarityOps}

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // same heap-UDAF hash-mode pin as ScaleSmoke/Bench — without it the
      // group-heavy bounded-heap aggregates fall back to sorting their
      // whole input past 128 keys/partition and every profile reads wrong
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val emb = Tables.embeddings(spark, dir)
    time("warmup-count") { emb.count() }

    if (args.contains("hnswcap")) {
      // isolated capped-vs-uncapped embedding family at the sf1 K decades
      val k = args.find(_.startsWith("k=")).map(_.drop(2).toInt).getOrElse(20)
      val big = (0 until k).map { c =>
        emb.select(
          (col("vec_id") + lit(c * 1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit(c * 0.001f)).otherwise(x)).as("embedding"))
      }.reduce(_ unionByName _).cache()
      val nv = big.count()
      val probes = big.filter(pmod(col("vec_id"), lit(500L)) === 3)
      val nlHnsw = math.max(16, (nv / 125L).toInt)
      val nlSem = math.max(8, (nv / 250L).toInt)
      for (round <- 1 to 2) {
        Seq("uncapped" -> Long.MaxValue, "auto" -> 0L).foreach { case (mode, cap) =>
          time(s"hnsw-$mode-$round") {
            SimilarityOps.knnHnsw(big, probes, "vec_id", "embedding",
              k = 10, nLists = nlHnsw, fineCap = cap).count()
          }
          time(s"semdedup-$mode-$round") {
            val pairs = SimilarityOps.cosineNearDupPairsBlockedFpForTest(
              big, "vec_id", "embedding", threshold = 0.4, nLists = nlSem,
              nProbe = 2, iters = 2,
              hierThreshold = SimilarityOps.HierRoutingThreshold, fineCap = cap)
            DedupOps.connectedComponentsFast(pairs, "id_a", "id_b").count()
          }
        }
      }
    }

    if (args.contains("rep")) {
      import graft.ops.TextOps
      val docs = Tables.documents(spark, dir)
      def noop(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      val toks = split(TextOps.normalize(col("text")), " ")
      val trigrams = when(size(toks) >= 3,
        zip_with(
          zip_with(
            slice(toks, lit(1), size(toks) - 2),
            slice(toks, lit(2), size(toks) - 2),
            (a, b) => concat(a, lit(" "), b)),
          slice(toks, lit(3), size(toks) - 2),
          (ab, c) => concat(ab, lit(" "), c)))
        .otherwise(array().cast("array<string>"))
      time("rep-warm") { docs.count() }
      for (round <- 1 to 2) {
        time(s"rep-full-$round") { noop(TextOps.repetitionStats(docs, "doc_id", "text")) }
        time(s"rep-trigram-expr-$round") {
          noop(docs.select(col("doc_id"),
            when(size(trigrams) > 0,
              (size(trigrams) - size(array_distinct(trigrams))).cast("double")
                / size(trigrams).cast("double")).as("f")))
        }
        time(s"rep-tokens-only-$round") {
          noop(docs.select(col("doc_id"), size(toks).as("n")))
        }
        time(s"rep-trihash-$round") {
          noop(docs.select(col("doc_id"),
            DedupOps.bindOnce(toks) { ts =>
              DedupOps.bindOnce(
                when(size(ts) >= 3,
                  transform(sequence(lit(1), size(ts) - 2),
                    i => xxhash64(concat_ws(" ", slice(ts, i, lit(3))))))
                  .otherwise(array().cast("array<bigint>"))
              ) { tg =>
                when(size(tg) > 0,
                  (size(tg) - size(array_distinct(tg))).cast("double")
                    / size(tg).cast("double"))
              }
            }.as("f")))
        }
      }
      spark.stop(); return
    }
    if (args.contains("curation")) {
      // stage decomposition of the two judge-flagged curation regressions
      // (q_training_manifest 3.9→5.36s, q_corpus_curation 3.6→4.53s judge
      // r4→r5): time each component of qCorpusCuration and the manifest
      // tail separately, twice, so the delta attributes to a stage
      import graft.ops.{DedupOps => D, SamplingOps, TextOps}
      def noop(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      val docs = Tables.documents(spark, dir)
      time("docs-warm") { docs.count() }
      for (round <- 1 to 2) {
        time(s"lang-id-$round") { noop(TextOps.langId(docs, "text")) }
        time(s"quality-$round") { noop(TextOps.qualityScore(docs, "doc_id", "text")) }
        time(s"exact-dedup-$round") { noop(D.exactDedup(docs, "doc_id", "text")) }
        time(s"jaccard-pairs-$round") {
          D.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
        }
        time(s"cc-over-pairs-$round") {
          D.connectedComponents(
            D.jaccardPairs(docs, "doc_id", "text", 3, 0.5), "doc_a", "doc_b").count()
        }
        time(s"pack-sequences-all-$round") {
          noop(SamplingOps.packSequences(docs, "doc_id", "text", 512, 8))
        }
        time(s"curation-full-$round") { noop(graft.SparkEntry.qCorpusCuration(spark, dir)) }
        time(s"training-manifest-$round") {
          noop(graft.SparkEntry.qTrainingManifest(spark, dir))
        }
        time(s"mixture-manifest-$round") {
          noop(graft.SparkEntry.qMixtureManifest(spark, dir))
        }
      }
      spark.stop(); return
    }
    if (args.contains("gapfill")) {
      import graft.ops.{Analytics, Merge}
      def noop(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      val orders = Tables.orders(spark, dir)
      time("orders-warm") { orders.count() }
      for (round <- 1 to 2) {
        time(s"monthly-lastwins-$round") {
          noop(graft.SparkEntry.qMonthlyLastClose(spark, dir))
        }
        time(s"gapfill-full-$round") {
          noop(graft.SparkEntry.qGapInterpolate(spark, dir))
        }
        val monthly = graft.SparkEntry.qMonthlyLastClose(spark, dir)
        time(s"gapfill-given-monthly-$round") {
          noop(Analytics.interpolateMonthlyGaps(monthly, "symbol", "date", "price"))
        }
        val flat = monthly.localCheckpoint(true)
        time(s"gapfill-given-checkpointed-$round") {
          noop(Analytics.interpolateMonthlyGaps(flat, "symbol", "date", "price"))
        }
      }
      spark.stop(); return
    }
    for (round <- 1 to 2) {
      time(s"ann-ivf-kmeans-$round") {
        SimilarityOps.knnIvfKmeans(
          emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 10, nLists = 16, nProbe = 4, maxIter = 3).count()
      }
      time(s"knn-brute-$round") {
        SimilarityOps.knnBrute(
          emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 10).count()
      }
    }
    // range join at 1000 bands: custom binary-search operator vs built-in BNL
    val bands1k = spark.range(1000).select(
      col("id").as("band_id"),
      (lit(900.0) + col("id").cast("double") * 105.0).as("lo"),
      (lit(1005.0) + col("id").cast("double") * 105.0).as("hi"))
    val priced = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double").as("price"))
    for (round <- 1 to 2) {
      time(s"rangejoin-custom-$round") {
        graft.plans.Plans.rangeLookup(priced, bands1k, "price", "lo", "hi")
          .groupBy("band_id").count().count()
      }
      time(s"rangejoin-bnl-$round") {
        priced.join(broadcast(bands1k), col("price") >= col("lo") && col("price") < col("hi"))
          .groupBy("band_id").count().count()
      }
    }

    val docs = Tables.documents(spark, dir)
    time("docs-count") { docs.count() }
    time("winnow-pairs") {
      DedupOps.winnowPairs(docs, "doc_id", "text", threshold = 0.3).count()
    }
    for (round <- 1 to 2) {
      time(s"full-minhash-$round") {
        DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 0.5).count()
      }
      time(s"full-jaccard-$round") {
        DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
      }
      time(s"full-simhash-$round") {
        DedupOps.simhashPairs(docs, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
