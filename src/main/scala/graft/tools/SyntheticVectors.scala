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

  /** Skewed corpus for the ONE-GIANT-CLUSTER regime: half the points form a
    * single DIFFUSE direction cluster (per-point noise σ=1 around a σ=3
    * center — non-twin pairs inside it sit near cos ≈ 0.9, below a 0.99
    * near-dup threshold), built as twin pairs (σ=0.01 within a pair →
    * planted near-dups at sim ≈ 1, ids 2i/2i+1); the other half spreads
    * over tight cold clusters with the [[clustered]] calibration (offset by
    * 10⁷ so id spaces never collide). Flat k-means blocking funnels the
    * diffuse half into one quadratic list; the salted blocking must
    * subdivide it while keeping every twin pair co-blocked.
    */
  def skewedOneCluster(
      nTwinPairs: Int,
      nColdClusters: Int,
      perCold: Int,
      dim: Int,
      seed: Long): Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(seed)
    val hotCenter = Array.fill(dim)(rng.nextGaussian() * 3)
    val hot = (0 until nTwinPairs).flatMap { i =>
      val base = hotCenter.map(_ + rng.nextGaussian() * 1.0)
      Seq(
        (2L * i, base.map(_ + rng.nextGaussian() * 0.01).toSeq),
        (2L * i + 1, base.map(_ + rng.nextGaussian() * 0.01).toSeq))
    }
    val cold = clustered(nColdClusters, perCold, dim, seed + 1)
      .map { case (id, v) => (10000000L + id, v) }
    hot ++ cold
  }
}
