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
