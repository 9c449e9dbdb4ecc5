package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the Spark analog of the reference's
  * Tree-AH index (/root/reference/vector_store/utils/index_manager.py:36-68;
  * leaf_node_embedding_count=500, leaf_nodes_to_search_percent=10,
  * common/config.py:36-37).
  *
  * Build: k-means over the corpus → every vector gets a `leaf_id`;
  * the index table is written `partitionBy(leaf_id)`, so a leaf is a
  * physical partition directory.
  *
  * Search: score the query against the (tiny, driver-local) centroid
  * set, take the top `nProbe` leaves, and scan only those — the
  * `leaf_id IN (...)` filter becomes Catalyst partition pruning, the
  * exact skip-90%-of-leaves behavior Tree-AH gets from its tree walk.
  * Within the probed leaves, scoring is exact (codegen dot product).
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def topLeaves(query: Array[Double], nProbe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        var s = 0.0
        var j = 0
        val n = math.min(c.length, query.length)
        while (j < n) { s += c(j) * query(j); j += 1 }
        (s, i)
      }.sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2).toSeq
  }

  /** Fit k-means and return (indexed corpus with leaf_id, model). */
  def build(emb: DataFrame, id: String, vecCol: String, numLeaves: Int,
      seed: Long = 42L, maxIter: Int = 10): (DataFrame, Model) = {
    val feat = emb.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans()
      .setK(numLeaves).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features").setPredictionCol("leaf_id")
    val model = km.fit(feat)
    val indexed = model.transform(feat).drop("__features")
    (indexed, Model(model.clusterCenters.map(_.toArray)))
  }

  /** Persist the index clustered by leaf — leaf scan = partition scan. */
  def write(indexed: DataFrame, path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("leaf_id").parquet(path)

  /** Leaf-pruned exact search over the persisted index. */
  def search(spark: SparkSession, path: String, model: Model,
      query: Array[Double], nProbe: Int, k: Int,
      id: String, vecCol: String): DataFrame = {
    val leaves = model.topLeaves(query, nProbe)
    val qCol = typedLit(query.toSeq)
    spark.read.parquet(path)
      .filter(col("leaf_id").isin(leaves: _*))
      .select(col(id), col("leaf_id"),
        graft.functions.vectors.dotProduct(col(vecCol), qCol).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }

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
