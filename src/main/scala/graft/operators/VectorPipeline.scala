package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The complete online-search lifecycle of the reference (SURVEY §3
  * E3) with the ANN path enabled — composition of the engine's parts:
  *
  *   query vector → IVF leaf pruning (partition-pruned scan)
  *   → restrict filters (pushdown-able columns)
  *   → exact scoring inside probed leaves (codegen dot product)
  *   → crowding cap (diversity) → top-k → metadata join.
  *
  * Mirrors Tree-AH serving semantics end to end: leaf skip ≈
  * leaf_nodes_to_search_percent, restricts ≈ allow-list filters,
  * crowding ≈ per-attribute result cap, k ≈
  * approximate_neighbors_count (common/config.py:30-41).
  */
object VectorPipeline {

  final case class AnnConfig(
      nProbe: Int,
      k: Int,
      crowdingCap: Option[Int] = None,
      restrict: Option[Column] = None)

  private def scoreAndRank(candidates: DataFrame, query: Array[Double],
      cfg: AnnConfig, id: String, vecCol: String,
      crowdingCol: String): DataFrame = {
    val restricted = cfg.restrict.map(candidates.filter).getOrElse(candidates)
    val scored = restricted.select(col(id), col(crowdingCol),
      graft.functions.vectors.dotProduct(col(vecCol), typedLit(query.toSeq))
        .as("score"))
    val crowded = cfg.crowdingCap match {
      case Some(cap) =>
        val w = Window.partitionBy(crowdingCol)
          .orderBy(col("score").desc, col(id))
        scored.withColumn("crn", row_number().over(w))
          .filter(col("crn") <= cap).drop("crn")
      case None => scored
    }
    crowded.orderBy(col("score").desc, col(id)).limit(cfg.k)
  }

  /** ANN search over an IVF-indexed corpus (`leaf_id` present). The
    * index stores each vector in its top-2 leaves (spill), so a probed
    * set can contain the same id twice — duplicates collapse before
    * scoring (the rows are identical apart from leaf_id, so the result
    * is deterministic).
    */
  def annSearch(indexed: DataFrame, model: IvfIndex.Model,
      query: Array[Double], cfg: AnnConfig, id: String, vecCol: String,
      crowdingCol: String): DataFrame = {
    val leaves = model.topLeaves(query, cfg.nProbe)
    val candidates = indexed.filter(col("leaf_id").isin(leaves: _*))
      .dropDuplicates(Seq(id))
    scoreAndRank(candidates, query, cfg, id, vecCol, crowdingCol)
  }

  /** Exact (all-candidates) variant — the recall oracle. */
  def exactSearch(corpus: DataFrame, query: Array[Double], cfg: AnnConfig,
      id: String, vecCol: String, crowdingCol: String): DataFrame =
    scoreAndRank(corpus, query, cfg, id, vecCol, crowdingCol)
}
