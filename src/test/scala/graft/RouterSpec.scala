package graft

import graft.operators.IvfIndex

/** The two-level centroid router (Tree-AH tree-walk analog): routed
  * probes must agree with the flat exact scan at high parity while
  * scoring a small, sublinear fraction of the centroid array — the
  * contract that lifts the flat router's leaf-count ceiling.
  */
class RouterSpec extends SparkTestBase {

  import PlantedVectors.planted

  private def plantedCentroids(nGroups: Int, perGroup: Int, dim: Int,
      seed: Long): Array[Array[Double]] =
    planted(nGroups, perGroup, dim, seed)._2

  test("routed topLeaves ≈ flat topLeaves while scoring ≪ L centroids") {
    val (centers, cents) = planted(48, 48, 16, 7L) // 2304 leaves
    val router = IvfIndex.Router.build(cents)
    val routed = IvfIndex.Model(cents, router = Some(router))
    val flat = IvfIndex.Model(cents)
    // in-distribution queries: a query looks like the data — near one
    // of the planted centers
    val rnd = new scala.util.Random(11)
    val queries = Seq.fill(50) {
      val c = centers(rnd.nextInt(48))
      Array.tabulate(16)(j => c(j) + rnd.nextGaussian())
    }

    val overlaps = queries.map { q =>
      val f = flat.topLeaves(q, 4).toSet
      val r = routed.topLeaves(q, 4).toSet
      f.intersect(r).size.toDouble / 4.0
    }
    val parity = overlaps.sum / overlaps.size
    assert(parity >= 0.9, s"routed/flat probe parity $parity < 0.9")

    // sublinear: the exact-ranked candidate pool is a small fraction
    // of the centroid array (supers scored: ~sqrt(L) more)
    queries.foreach { q =>
      val cand = routed.routedCandidates(router, q, 4)
      assert(cand.length < cents.length / 4,
        s"candidate pool ${cand.length} not sublinear vs L=${cents.length}")
    }
  }

  test("Router.build is deterministic (pure function of the centroids)") {
    val cents = plantedCentroids(32, 40, 8, 3L)
    val a = IvfIndex.Router.build(cents)
    val b = IvfIndex.Router.build(cents)
    assert(a.groupOf.sameElements(b.groupOf))
    assert(a.superCentroids.zip(b.superCentroids).forall {
      case (x, y) => java.util.Arrays.equals(x, y)
    })
  }

  test("production-size builds stay flat (router only past MinLeaves)") {
    val emb = Tables.embeddings(spark, sf)
    val (_, model) = IvfIndex.build(emb, "vec_id", "embedding", 8)
    assert(model.router.isEmpty,
      "small builds must not attach a router — probe hashes depend on it")
    assert(IvfIndex.Router.MinLeaves > 256)
  }

  test("a tiny or single-group router degrades to the flat scan") {
    val cents = plantedCentroids(4, 4, 8, 9L)
    val m = IvfIndex.Model(cents,
      router = Some(IvfIndex.Router(Array(cents(0)), new Array[Int](16))))
    val flat = IvfIndex.Model(cents)
    val q = Array.fill(8)(0.5)
    assert(m.topLeaves(q, 3) == flat.topLeaves(q, 3))
  }
}
