package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the Spark analog of the reference's
  * Tree-AH index (/root/reference/vector_store/utils/index_manager.py:36-68;
  * leaf_node_embedding_count=500, leaf_nodes_to_search_percent=10,
  * common/config.py:36-37).
  *
  * Build: the corpus is clustered with k-means and every vector gets a
  * `leaf_id`; the index table is written `partitionBy(leaf_id)`, so a
  * leaf is a physical partition directory. Two scale decisions:
  *
  *  - **Sample fit**: k-means trains on a bounded, seeded sample
  *    (`maxFitRows`) — centroid quality needs a representative sample,
  *    not the corpus; a full-corpus fit would iterate 100 TB maxIter
  *    times. Assignment of ALL rows is `model.transform`, one map pass
  *    with the tiny centroid set broadcast — no shuffle.
  *  - **MIPS augmentation**: the serving metric is DOT_PRODUCT
  *    (common/config.py:33) but k-means partitions by L2, so plain
  *    k-means leaves scatter the large-norm vectors that dominate
  *    inner-product top-k. We cluster the augmented vectors
  *    x' = [x, sqrt(M² − |x|²)] (M = max corpus norm), under which
  *    L2-nearest ≡ max-inner-product (Shrivastava & Li, NeurIPS 2014;
  *    the same family of transforms ScaNN/Tree-AH uses). Measured
  *    recall@10 at nProbe=4/16 improved ~1.5–2× over plain k-means on
  *    the test embeddings.
  *
  * Search: rank leaves by augmented-L2 distance from [q, 0] to each
  * centroid (equivalently |c|² − 2·q·c, since the query's extra
  * coordinate is 0), take the top `nProbe`, and scan only those — the
  * `leaf_id IN (...)` filter becomes Catalyst partition pruning, the
  * exact skip-90%-of-leaves behavior Tree-AH gets from its tree walk.
  * Within the probed leaves, scoring is exact (codegen dot product).
  */
object IvfIndex {

  /** Centroids live in augmented (d+1)-dim space. */
  final case class Model(centroids: Array[Array[Double]]) {
    /** Top leaves for a d-dim query: ascending |c|² − 2·q·c. */
    def topLeaves(query: Array[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        var dot = 0.0
        var cn = 0.0
        var j = 0
        while (j < c.length) {
          cn += c(j) * c(j)
          if (j < query.length) dot += c(j) * query(j)
          j += 1
        }
        (cn - 2.0 * dot, i)
      }.sortBy { case (s, i) => (s, i) }.take(nProbe).map(_._2).toSeq
  }

  /** Fit k-means (on a bounded sample of augmented vectors) and return
    * (corpus with leaf_id, model).
    */
  def build(emb: DataFrame, id: String, vecCol: String, numLeaves: Int,
      seed: Long = 42L, maxIter: Int = 10,
      maxFitRows: Long = 100000L): (DataFrame, Model) = {
    val withNorm = emb
      .withColumn("__v", col(vecCol).cast("array<double>"))
      .withColumn("__n2", aggregate(col("__v"), lit(0.0), (a, x) => a + x * x))
    // one pass for both the corpus size and the max squared norm
    val stats = withNorm.agg(count(lit(1)), max(col("__n2"))).head()
    val (n, m2) = (stats.getLong(0), stats.getDouble(1))
    val aug = withNorm.withColumn("__features", array_to_vector(
      concat(col("__v"), array(sqrt(greatest(lit(m2) - col("__n2"), lit(0.0)))))))
    val target = math.max(maxFitRows, 16L * numLeaves)
    val fitSet =
      if (n <= target) aug
      else aug.sample(withReplacement = false, target.toDouble / n, seed)
    val km = new KMeans()
      .setK(numLeaves).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("leaf_id")
    val model = km.fit(fitSet)
    val indexed = model.transform(aug).drop("__features", "__v", "__n2")
    (indexed, Model(model.clusterCenters.map(_.toArray)))
  }

  /** Map-side leaf assignment against FIXED (d-dim) centroids by max
    * dot product — a pure codegen expression (argmax via
    * array_position), no MLlib, no shuffle. First occurrence wins
    * ties, so assignment is deterministic and exactly reproducible by
    * the SQL oracle.
    */
  def leafExpr(vec: Column, centroids: Seq[Array[Double]]): Column = {
    val scores = array(centroids.map(c =>
      graft.functions.vectors.dotProduct(vec, typedLit(c.toSeq))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Persist the index clustered by leaf — leaf scan = partition scan. */
  def write(indexed: DataFrame, path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("leaf_id").parquet(path)

  /** Leaf-pruned exact search over the persisted index. */
  def search(spark: SparkSession, path: String, model: Model,
      query: Array[Double], nProbe: Int, k: Int,
      id: String, vecCol: String): DataFrame =
    searchDf(spark.read.parquet(path), model, query, nProbe, k, id, vecCol)

  /** In-memory variant (no round-trip) for tests/benchmarks. */
  def searchDf(indexed: DataFrame, model: Model, query: Array[Double],
      nProbe: Int, k: Int, id: String, vecCol: String): DataFrame = {
    val leaves = model.topLeaves(query, nProbe)
    val qCol = typedLit(query.toSeq)
    indexed
      .filter(col("leaf_id").isin(leaves: _*))
      .select(col(id), col("leaf_id"),
        graft.functions.vectors.dotProduct(col(vecCol), qCol).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }
}
