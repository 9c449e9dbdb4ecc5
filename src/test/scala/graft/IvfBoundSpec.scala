package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

/** Leaf-size contract of the IVF build — the reference's
  * leaf_node_embedding_count bound (common/config.py:36) must hold on
  * corpora k-means alone would skew.
  */
class IvfBoundSpec extends SparkTestBase {
  import spark.implicits._

  private def maxLeafSize(indexed: org.apache.spark.sql.DataFrame): Long =
    indexed.groupBy("leaf_id").count().agg(max("count")).head().getLong(0)

  test("skewed corpus: recursive split bounds every leaf") {
    // 900 vectors packed into one tight cluster + 100 spread out: a
    // 4-leaf k-means puts ~900 in one leaf; the recursive split must
    // break that leaf up until every stored leaf is within the bound
    val dense = (0 until 900).map { i =>
      (i.toLong, Array(10.0f + (i % 30) * 0.01f, 10.0f + (i / 30) * 0.01f))
    }
    val sparse = (0 until 100).map { i =>
      (900L + i, Array((i % 10) * 40.0f, (i / 10) * 40.0f))
    }
    val emb = (dense ++ sparse).toDF("vec_id", "embedding")
    val bound = 150
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding",
      numLeaves = 4, maxLeafSize = bound)
    val idx = indexed.cache()
    try {
      assert(maxLeafSize(idx) <= bound,
        s"a leaf exceeds the $bound-row bound")
      // spill stores each vector exactly twice
      assert(idx.count() == 2000)
      assert(idx.select("vec_id").distinct().count() == 1000)
      // the split actually fired: more leaves than requested
      assert(model.centroids.length > 4)
      // every leaf_id is a valid centroid index
      val maxId = idx.agg(max("leaf_id")).head().getInt(0)
      assert(maxId < model.centroids.length)
    } finally { idx.unpersist(); () }
  }

  test("degenerate corpus: identical vectors fall back to hash split") {
    // k-means cannot separate identical points; the deterministic hash
    // sub-split across centroid copies must still hold the bound
    val emb = (0 until 400).map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val bound = 100
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding",
      numLeaves = 2, maxLeafSize = bound, maxSplitRounds = 2)
    val idx = indexed.cache()
    try {
      assert(maxLeafSize(idx) <= bound,
        s"hash fallback failed to bound a degenerate leaf")
      assert(idx.select("vec_id").distinct().count() == 400)
      // probing every leaf still reaches every vector
      val probed = IvfIndex.searchDf(idx, model, Array(1.0, 2.0, 3.0),
        nProbe = model.centroids.length, k = 400, "vec_id", "embedding")
      assert(probed.count() == 400)
    } finally { idx.unpersist(); () }
  }

  test("build is deterministic across partition layouts") {
    // the hash-predicate fit sample (not df.sample) makes centroids a
    // pure function of the DATA — repartitioning must not move them
    val emb = Tables.embeddings(spark, sf)
    val (_, m1) = IvfIndex.build(emb, "vec_id", "embedding", 8)
    val (_, m2) = IvfIndex.build(emb.repartition(13), "vec_id", "embedding", 8)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("empty corpus fails loudly") {
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.build(emb, "vec_id", "embedding", 4)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("buildTwoLevel: hierarchical fit honors the same contract as " +
      "build — bound, spill, determinism, searchable") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val bound = 40
    val (indexed, model) = IvfIndex.buildTwoLevel(emb, "vec_id",
      "embedding", numLeaves = 24, maxLeafSize = bound)
    val idx = indexed.cache()
    try {
      // numLeaves is a target under per-super rounding; the leaf
      // count must land near it and the bound must hold exactly
      assert(model.centroids.length >= 12 &&
        model.centroids.length <= 64,
        s"got ${model.centroids.length} leaves for a 24-leaf target")
      assert(maxLeafSize(idx) <= bound)
      assert(idx.select("vec_id").distinct().count() == n)
      assert(idx.count() == 2 * n) // spill=2 stores each vector twice
      assert(model.stats.nVectors == n)
      // deterministic: a rebuild over a different partition layout is
      // bit-identical (same hash samples, canonical fit layout,
      // per-super seeds)
      val (_, m2) = IvfIndex.buildTwoLevel(emb.repartition(13), "vec_id",
        "embedding", numLeaves = 24, maxLeafSize = bound)
      assert(model.centroids.map(_.toSeq).toSeq ==
        m2.centroids.map(_.toSeq).toSeq)
      // the index it produces serves: exact-in-probed-leaves search
      // over ALL leaves reaches every vector (same contract the
      // degenerate-build test pins for build())
      val q = emb.filter(col("vec_id") === 7)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      val probed = IvfIndex.searchDf(idx, model, q,
        nProbe = model.centroids.length, k = 10, "vec_id", "embedding")
        .select("vec_id").as[Long].collect()
      assert(probed.head == 7L, "the query's own vector must rank first")
    } finally { idx.unpersist(); () }
  }

  test("build dispatches to the hierarchical fit past the threshold " +
      "and clamps a leaf target larger than the corpus") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    // a leaf ask past TwoLevelFitThreshold on a corpus smaller than
    // the ask: the one-shot fit could never serve this (k > n); the
    // dispatched hierarchical path clamps the target to n
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding",
      numLeaves = IvfIndex.TwoLevelFitThreshold, maxLeafSize = 40)
    val idx = indexed.cache()
    try {
      assert(model.centroids.length <= n,
        s"clamp: ${model.centroids.length} leaves for an $n-row corpus")
      assert(model.centroids.length >= n / 2,
        "a per-vector-scale ask should land near one leaf per vector")
      assert(maxLeafSize(idx) <= 40)
      assert(idx.select("vec_id").distinct().count() == n)
      assert(model.stats.nVectors == n)
    } finally { idx.unpersist(); () }
  }
}
