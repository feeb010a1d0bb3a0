package graft.tools

/** Deterministic clustered-Gaussian vector corpus — ONE definition shared by
  * ScaleSmoke (which measures the blocked near-dup on it) and the similarity
  * specs (which pin recall on it), so the measured benchmark and the recall
  * guarantees provably exercise the same regime: well-separated centers
  * (σ=3 per dim) with tight per-point noise (σ=0.05), ids `c·stride + i`.
  * A calibration change here moves both the numbers and the pins together.
  */
object SyntheticVectors {
  def clustered(
      nClusters: Int,
      perCluster: Int,
      dim: Int,
      seed: Long,
      stride: Long = 1000L): Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextGaussian() * 3))
    for { c <- 0 until nClusters; i <- 0 until perCluster }
      yield (c * stride + i, centers(c).map(_ + rng.nextGaussian() * 0.05).toSeq)
  }
}
