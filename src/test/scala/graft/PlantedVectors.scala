package graft

/** Shared synthetic centroid fixture: clustered centroid sets (the
  * realistic shape — k-means centroids of clustered data inherit the
  * data's cluster structure), used by the router/probe parity specs.
  */
object PlantedVectors {
  /** (cluster centers, centroids) — centroid i belongs to center
    * i % nGroups, deterministic per seed.
    */
  def planted(nGroups: Int, perGroup: Int, dim: Int,
      seed: Long): (Array[Array[Double]], Array[Array[Double]]) = {
    val rnd = new scala.util.Random(seed)
    val centers =
      Array.fill(nGroups)(Array.fill(dim)(rnd.nextGaussian() * 10.0))
    val cents = Array.tabulate(nGroups * perGroup) { i =>
      val c = centers(i % nGroups)
      Array.tabulate(dim)(j => c(j) + rnd.nextGaussian())
    }
    (centers, cents)
  }
}
