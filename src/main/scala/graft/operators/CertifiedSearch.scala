package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CERTIFIED exact top-k over the IVF serving layout — leaf pruning
  * with a proof, not a recall target.
  *
  * The probed search (`IvfIndex.searchDf`) is exact WITHIN the probed
  * leaves but approximate overall: nothing says the unprobed leaves
  * hold no better row. This module adds the missing certificate via
  * the classic ball bound: for a leaf with reference point c (its
  * centroid's raw components) and radius r = max over members of
  * ‖x − c‖, Cauchy–Schwarz gives every member
  *
  *     ⟨x, q⟩ = ⟨c, q⟩ + ⟨x − c, q⟩ ≤ ⟨c, q⟩ + r·‖q‖ =: UB(leaf)
  *
  * so once the running kth-best score meets or beats UB of every
  * unprobed leaf, the probed top-k IS the exact top-k. [[Serving.searchCertified]]
  * probes leaves in UB order, doubling the probe set until the
  * certificate closes — on clustered data (small radii) that is a
  * handful of leaves; on adversarial data it degrades gracefully to
  * the full scan a true exact answer genuinely needs.
  *
  * Radii live in a `_graft_radii` sidecar (leaf_id, radius), an
  * OPT-IN metadata pass like the manifest's promoted stats:
  * [[buildRadii]] computes them from the layout in one aggregation;
  * `IndexMaintenance.appendToServing` max-merges the touched leaves
  * when the sidecar exists; `compactServing` carries the file across
  * the swap (LWW compaction only removes rows, so an existing radius
  * stays an over-estimate). Every maintenance path is
  * OVER-ESTIMATE-SAFE by convention: a leaf ABSENT from the sidecar
  * has radius +∞ — it is always probed, never wrongly skipped — so
  * a rebalance that mints new leaf ids weakens the certificate until
  * the next [[buildRadii]] instead of breaking it.
  *
  * Reference scope: the reference serves approximate neighbors only
  * (Tree-AH, /root/reference/vector_store/utils/index_manager.py:49-57);
  * certified-exact serving is an engine-completeness capability the
  * 100 TB design bar asks for (auditable retrieval, dedup oracles).
  */
object CertifiedSearch {

  def radiiDir(path: String): String = path + "/_graft_radii"

  def radiiExist(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(radiiDir(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The per-leaf reference points for radius computation: each
    * centroid's first `dim` components (augmented models carry one
    * extra aux coordinate; any fixed reference point yields an
    * admissible bound, and the raw prefix is the tightest one we
    * store), zero-padded if the model is narrower.
    */
  private def centDf(spark: SparkSession, model: IvfIndex.Model,
      dim: Int): DataFrame = {
    val rows = model.centroids.zipWithIndex.map { case (c, i) =>
      (i, java.util.Arrays.copyOf(c, dim).toSeq)
    }.toSeq
    spark.createDataFrame(rows).toDF("leaf_id", "__cent")
  }

  private def rowDim(data: DataFrame, vecCol: String): Int =
    data.select(size(col(vecCol))).head().getInt(0)

  /** Compute and persist per-leaf radii from the CURRENT layout — one
    * distributed aggregation (distance of every row to its leaf's
    * reference point, max per leaf), one tiny sidecar write. Rerun
    * any time; always valid for the state it scanned, and appends
    * from then on max-merge automatically.
    */
  def buildRadii(spark: SparkSession, path: String,
      vecCol: String = "embedding"): Unit = {
    val model = IvfIndex.load(spark, path)
    val data = ServingManifest.openOrRead(spark, path)
    val radii = radiiOf(spark, data, model, vecCol)
    writeRadii(spark, path, radii)
  }

  /** (leaf_id, radius) of `rows` — max member distance per leaf. */
  private[operators] def radiiOf(spark: SparkSession, rows: DataFrame,
      model: IvfIndex.Model, vecCol: String): Seq[(Int, Double)] = {
    val dim = rowDim(rows, vecCol)
    rows.join(broadcast(centDf(spark, model, dim)), "leaf_id")
      .groupBy(col("leaf_id"))
      .agg(max(graft.functions.vectors.l2Distance(
        col(vecCol).cast("array<double>"), col("__cent"))).as("radius"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
  }

  private def writeRadii(spark: SparkSession, path: String,
      radii: Seq[(Int, Double)]): Unit = {
    spark.createDataFrame(radii).toDF("leaf_id", "radius")
      .coalesce(1).write.mode("overwrite").parquet(radiiDir(path))
  }

  /** Max-merge radii for an appended batch's touched leaves — called
    * by the serving append path when the sidecar exists. The batch's
    * per-leaf max can only RAISE a radius (max-merge), so concurrent
    * readers keep an admissible bound throughout.
    */
  private[graft] def mergeAppend(spark: SparkSession, path: String,
      assigned: DataFrame, vecCol: String): Unit = {
    if (!radiiExist(spark, path)) return
    val model = IvfIndex.load(spark, path)
    val batch = radiiOf(spark, assigned, model, vecCol).toMap
    val old = loadRadii(spark, path)
    val merged = (old.keySet ++ batch.keySet).toSeq.map { l =>
      (l, math.max(old.getOrElse(l, 0.0), batch.getOrElse(l, 0.0)))
    }
    writeRadii(spark, path, merged)
  }

  def loadRadii(spark: SparkSession, path: String): Map[Int, Double] =
    spark.read.parquet(radiiDir(path))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap

  /** Copy the sidecar onto a compacted twin (compaction removes rows,
    * so the radii stay over-estimates — admissible).
    */
  private[graft] def copyTo(spark: SparkSession, from: String,
      to: String): Unit = {
    if (!radiiExist(spark, from)) return
    writeRadii(spark, to, loadRadii(spark, from).toSeq)
  }

  /** Per-leaf upper bounds ⟨c, q⟩ + r·‖q‖, sorted descending; leaves
    * without a radius bound at +∞ (always probed).
    */
  private[operators] def upperBounds(model: IvfIndex.Model,
      radii: Map[Int, Double], query: Array[Double])
      : Array[(Int, Double)] = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    model.centroids.zipWithIndex.map { case (c, i) =>
      var dot = 0.0
      var j = 0
      val n = math.min(c.length, query.length)
      while (j < n) { dot += c(j) * query(j); j += 1 }
      val ub = radii.get(i) match {
        case Some(r) => dot + r * qn
        case None => Double.PositiveInfinity
      }
      (i, ub)
    }.sortBy { case (i, ub) => (-ub, i) }
  }
}
