package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SimilarityOps

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private def emb = Tables.embeddings(spark, TestSpark.sf0001)

  test("knnBrute: k rows per probe, sims within [-1,1], self excluded, ranks contiguous") {
    val probes = emb.filter(col("vec_id") < 5)
    val got = SimilarityOps.knnBrute(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(got.length == 5 * 10)
    assert(got.forall { case (p, n, s, _) => p != n && s >= -1.0001 && s <= 1.0001 })
    val byProbe = got.groupBy(_._1)
    assert(byProbe.values.forall(_.map(_._4).sorted.toSeq == (1L to 10L)))
    // ranked descending by similarity
    assert(byProbe.values.forall { rs =>
      val sims = rs.sortBy(_._4).map(_._3); sims.zip(sims.tail).forall { case (a, b) => a >= b }
    })
  }

  test("knnIvf recall vs brute force is well above random scanning") {
    val probes = emb.filter(col("vec_id") < 20)
    val brute = SimilarityOps.knnBrute(emb, probes, "vec_id", "embedding", 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.knnIvf(emb, probes, "vec_id", "embedding", 10, nLists = 16, nProbe = 4)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // nProbe/nLists = 25% of lists scanned; random would give ~0.25 recall
    assert(recall > 0.35, s"recall=$recall")
    assert(ivf.size <= brute.size)
  }
}
