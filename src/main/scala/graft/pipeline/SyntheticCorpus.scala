package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic word-salad corpus for SCALE smokes — the
  * driver testdata tops out at sf0.1 (5 000 documents), so validating
  * that the bucketed dedup paths stay sub-quadratic at sf1 (50 000
  * documents) needs a generated corpus. Everything is expression-built
  * (no driver-side data), so generation distributes and costs one
  * projection over `spark.range`.
  *
  * Shape mirrors the driver corpus where it matters for LSH: ~80
  * tokens/doc drawn from a 5 000-word vocabulary (shared vocabulary,
  * separable shingles), with PLANTED near-dup pairs: every doc with
  * id ≡ 0 (mod 100) is paired with id+1 sharing 79/80 tokens (one
  * token perturbed) — n/100 true pairs, so candidate counts can be
  * checked against both floors (recall) and ceilings (selectivity).
  */
object SyntheticCorpus {

  val TokensPerDoc = 80
  val VocabSize = 5000

  /** n documents as (doc_id, text); docs (100k, 100k+1) are planted
    * near-dup pairs.
    */
  def docs(spark: SparkSession, n: Long): DataFrame = {
    val seed = when(col("doc_id") % 100 === 1, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val perturbed = col("doc_id") % 100 === 1
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("__seed", seed)
      .select(col("doc_id"), concat_ws(" ",
        transform(sequence(lit(0), lit(TokensPerDoc - 1)), j =>
          when(perturbed && j === 0,
            concat(lit("p"), col("doc_id")))
            .otherwise(concat(lit("w"),
              pmod(xxhash64(col("__seed"), j), lit(VocabSize.toLong))))))
        .as("text"))
  }

  /** Number of planted near-dup pairs in [[docs]](n). */
  def plantedPairs(n: Long): Long = (n + 99) / 100

  /** n deterministic synthetic embeddings as (vec_id, embedding):
    * `clusters` well-separated integer lattice centers, vector v =
    * center(v mod clusters) + small hash noise — the ANN-path analog
    * of [[docs]] (planted cluster structure so IVF leaves are
    * meaningful, expression-built so generation distributes).
    */
  def vectors(spark: SparkSession, n: Long, dim: Int,
      clusters: Int): DataFrame = {
    val center = col("vec_id") % clusters
    spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"), transform(sequence(lit(0), lit(dim - 1)), j =>
        // centers live on a coarse integer lattice; noise is ±0.4
        (pmod(xxhash64(center, j), lit(20L)).cast("double") * 10.0) +
          (pmod(xxhash64(col("vec_id"), j), lit(800L)).cast("double") / 1000.0)
      ).as("embedding"))
  }
}
