package graft.operators

import graft.functions.text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear bag-of-words text-classifier INFERENCE — the model-based
  * quality filter modern pipelines run after the heuristic gates
  * (fastText-style: Joulin et al. 2016; the DCLM / LLaMA-class
  * pipelines score every candidate page with exactly this shape):
  * score(doc) = (Σ_t w[t]·count[t]) / n_tokens against a trained
  * linear model, keep iff score ≥ threshold.
  *
  * Spark-first realization: the MODEL IS A TABLE — (term, weight)
  * rows broadcast onto an exploded token stream, one broadcast-hash
  * join + one per-doc partial-aggregable sum, so inference is a
  * single embarrassingly-parallel pass with no wide shuffle (the
  * per-doc agg's key is the doc id the tokens already carry). At
  * 100 TB: the model stays KB–MB (vocab-bounded) regardless of
  * corpus size; a hashed-feature variant (polyHash(term) mod 2^k as
  * the join key) bounds it further with zero plan change. Scoring
  * arithmetic is EXACT — integer milli-weights, integer counts, one
  * IEEE division at the end — so the whole operator hash-gates and
  * is partitioning/retry-invariant (a float accumulation would not
  * be).
  *
  * The reference pipeline has no learned filter (it embeds whatever
  * it ingests; `setup_vector_search.py` gates on token count alone —
  * SURVEY §2.2 P2); this is north-star scope like the rest of the
  * quality family (`t_gopher_rules`, `t_c4_rules`).
  */
object TextClassifier {

  /** Committed demonstration model: integer milli-weights over the
    * corpus vocabulary (a trained model ships the same way — this is
    * the artifact a fastText-to-table export produces). OOV terms
    * score 0 (the LEFT join's null), exactly fastText's behavior for
    * unseen buckets.
    */
  val QualityWeights: Seq[(String, Long)] = Seq(
    "data" -> 900L, "query" -> 800L, "table" -> 700L, "spark" -> 1000L,
    "vector" -> 950L, "column" -> 600L, "stream" -> 500L,
    "window" -> 400L, "filter" -> 650L, "join" -> 700L, "group" -> 300L,
    "sort" -> 250L, "merge" -> 350L, "scan" -> 550L, "hash" -> 450L,
    "key" -> 200L, "value" -> 100L, "row" -> 150L, "batch" -> 300L,
    "line" -> -100L, "customer" -> -200L, "order" -> -150L,
    "part" -> -250L, "small" -> -300L, "big" -> -350L, "fast" -> -50L,
    "slow" -> -400L, "a" -> -800L, "the" -> -600L, "agg" -> 500L,
    "dup" -> -1000L)

  /** Default keep threshold in milli-weight units: mean token weight
    * ≥ 250/1000.
    */
  val DefaultThresholdMilli = 250L

  /** Score every doc: (id, n_tokens, score_num, score, keep).
    * `score_num` = Σ w[t]·count[t] exact; `score` = score_num /
    * n_tokens (one IEEE division); `keep` = score_num ≥
    * thresholdMilli·n_tokens — an exact integer comparison, so the
    * decision can never flip on float rounding. Docs with no tokens
    * score 0.0 and are dropped.
    */
  def score(spark: SparkSession, docs: DataFrame, id: String,
      textCol: String, weights: Seq[(String, Long)] = QualityWeights,
      thresholdMilli: Long = DefaultThresholdMilli,
      carry: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val model = weights.toDF("__term", "__w")
    // carried columns (e.g. source for downstream mixing) ride the
    // token rows and the per-doc agg — one pass, never a join back
    // to the corpus on the doc id
    val carried = carry.map(col)
    val toks = docs
      .select(col(id) +: carried :+ text.tokens(col(textCol)).as("tk"): _*)
      .select(col(id) +: carried :+ explode(col("tk")).as("__term"): _*)
    val sc = toks
      .join(broadcast(model), Seq("__term"), "left")
      .groupBy(id, carry: _*)
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum("__w"), lit(0L)).as("score_num"))
    docs.select(col(id) +: carried: _*)
      .join(sc, id +: carry, "left")
      .select(col(id) +: carried ++: Seq(
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_num"), lit(0L)).as("score_num"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, 0.0)
          .otherwise(col("score_num").cast("double") / col("n_tokens"))
          .as("score"),
        (coalesce(col("n_tokens"), lit(0L)) > 0L &&
          coalesce(col("score_num"), lit(0L)) >=
            lit(thresholdMilli) * coalesce(col("n_tokens"), lit(0L)))
          .as("keep")): _*)
  }

  /** The weight table as a SQL VALUES fragment for the DuckDB oracle. */
  def sqlWeightValues(weights: Seq[(String, Long)] = QualityWeights): String =
    weights.map { case (t, w) => s"('$t',$w)" }.mkString("VALUES ", ",", "")
}
