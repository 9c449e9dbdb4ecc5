package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

/** sf1-scale smoke for the ANN path: a 50 000-vector synthetic corpus
  * (25× the largest driver embeddings table) with planted cluster
  * structure — the IVF build must keep its leaf-size contract and its
  * recall at a size where a degenerate design (full-corpus fit,
  * unbounded leaves, single assignment) would visibly break.
  */
class AnnScaleSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 50000L
  private val Dim = 32
  private val Clusters = 25

  /** Deterministic synthetic embeddings: 25 well-separated integer
    * cluster centers + hash noise (graft.pipeline.SyntheticCorpus;
    * expression-built, distributes, no driver data).
    */
  private lazy val emb = {
    val e = graft.pipeline.SyntheticCorpus.vectors(spark, N, Dim, Clusters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    e
  }

  test("sf1 IVF: build bounds leaves and keeps recall at 50k vectors") {
    val maxLeaf = 6000
    // maxFitRows below n exercises the hash-sampled fit at scale
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding",
      numLeaves = 32, maxLeafSize = maxLeaf, maxFitRows = 20000L)
    val idx = indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // leaf contract at scale
      val maxSize = idx.groupBy("leaf_id").count()
        .agg(max("count")).head().getLong(0)
      assert(maxSize <= maxLeaf, s"leaf of $maxSize rows exceeds $maxLeaf")
      assert(idx.count() == 2 * N) // spill stores each vector twice

      // probe: 10 query vectors, nProbe = 8 of >=32 leaves; recall@10
      // vs exact dot-product kNN must hold while scanning a fraction.
      // Both sides batched: ONE probe join and ONE broadcast-scored
      // pass (the v_ann_ivf shape), not 20 sequential jobs.
      val queries = emb.filter(col("vec_id") % 5000 === 3)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      assert(queries.length == 10)
      val probeDf = queries.toSeq.flatMap { case (qid, qv) =>
        model.topLeaves(qv.toArray, 8).map(l => (qid, qv, l))
      }.toDF("qid", "qv", "leaf_id")
      val approx = graft.operators.Knn.topKPerQuery(
        idx.join(broadcast(probeDf), "leaf_id")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            graft.functions.vectors.dotProduct(col("embedding"), col("qv"))
              .as("score"))
          .dropDuplicates(Seq("qid", "vec_id")),
        10, "qid", "vec_id", graft.operators.Knn.Dot)
        .select("qid", "vec_id")
      val truth = graft.operators.Knn.topKPerQuery(
        graft.operators.Knn.score(emb, queries.toSeq.toDF("qid", "qv"),
          "embedding", "qv", graft.operators.Knn.Dot)
          .filter(col("vec_id") =!= col("qid"))
          .select("qid", "vec_id", "score"),
        10, "qid", "vec_id", graft.operators.Knn.Dot)
        .select("qid", "vec_id")
      val hits = approx.join(truth, Seq("qid", "vec_id")).count()
      val recall = hits.toDouble / (queries.length * 10.0)
      assert(recall >= 0.7, s"recall@10 fell to $recall at n=$N")

      // pruning actually prunes: 8 probed leaves cover well under half
      // the (spilled) corpus
      val probed = model.topLeaves(queries.head._2.toArray, 8)
      val scanned = idx.filter(col("leaf_id").isin(probed: _*)).count()
      assert(scanned.toDouble / (2 * N) < 0.5,
        s"probe scans $scanned of ${2 * N} rows — pruning is not pruning")
    } finally { idx.unpersist(); () }
  }

  test("sf1 kNN self-join: candidate volume linear in n under the leaf bound") {
    val maxLeaf = 1000
    val (indexed, _) = IvfIndex.build(emb, "vec_id", "embedding",
      numLeaves = 128, maxLeafSize = maxLeaf, maxFitRows = 20000L)
    val idx = indexed
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stored = idx.count() // 2n with top-2 spill
      assert(stored == 2 * N)
      // candidate volume of the leaf equi-join, ANALYTICALLY (Σ size²
      // over leaves) — the same selectivity evidence the LSH paths
      // record, no join materialization needed
      val candOrdered = idx.groupBy("leaf_id").count()
        .agg(sum(col("count") * col("count"))).head().getLong(0)
      // bounded leaves ⇒ Σ size² ≤ maxLeaf · Σ size: linear in n with
      // the leaf bound (× spill factor 2) as the constant
      assert(candOrdered <= maxLeaf.toLong * stored,
        s"candidate volume $candOrdered exceeds maxLeaf×rows " +
          s"${maxLeaf.toLong * stored}")
      // and a small fraction of the quadratic cross product
      assert(candOrdered < stored * stored / 20,
        s"candidate volume $candOrdered is not sub-quadratic " +
          s"(n²=${stored * stored})")
      // the operator end to end at 50k: every vector ranked, ≤ k rows
      val out = graft.operators.Knn
        .knnJoinPerLeaf(idx, "vec_id", "embedding", 3,
          graft.operators.Knn.Dot)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        assert(out.count() <= 3L * N)
        assert(out.select("qid").distinct().count() == N,
          "some vector got no neighbors despite 2-leaf spill")
      } finally { out.unpersist(); () }
    } finally { idx.unpersist(); () }
  }
}
