package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-partition token-budget selection — the mixture-weighting
  * primitive of dataset curation (cf. DoReMi, Xie et al. 2023; the
  * Pile's per-source epochs, Gao et al. 2020): from each part
  * (source/domain), take documents in a deterministic priority order
  * until that part's token budget is exhausted. Downsampling a
  * dominant crawl to X tokens and upsampling a small high-quality
  * source to Y tokens are both "budget per part" with the mixture
  * weights expressed as budgets (see [[graft.queries.PipelineQueries]]
  * `p_token_budget` for the constant-budget form and `p_epoch_plan`
  * for the epochs + remainder upsampling plan).
  *
  * Semantics (exact greedy): order each part's rows by (pr, key);
  * keep a row iff the running weight-sum of its predecessors is
  * `< budget` — so the straddling document is kept (its predecessor
  * total was still under budget) and everything after it is dropped.
  *
  * [[naive]] is the one-window-per-part literal transcription and the
  * oracle's shape: `sum(w) OVER (PARTITION BY part ORDER BY ...)`.
  * At 100 TB that window is the scale killer — Spark materializes an
  * ENTIRE window partition in one task, so a 40 TB crawl source
  * becomes a single-task sort.
  *
  * [[scalable]] computes the identical set without ever windowing
  * more than one priority bucket per part: the priority is already a
  * bounded integer (pr ∈ [0, buckets)), so a (part, pr) weight
  * histogram — a map-side-combined aggregate, |parts|·buckets rows
  * total — locates each part's budget boundary. Buckets wholly under
  * budget are kept with no ordering at all; buckets wholly past it
  * are dropped at the scan; only the ONE straddling bucket per part
  * (≈ 1/buckets of that part's rows) flows into the exact window,
  * offset by the histogram's prefix. Boundary ties (prefix + bucket
  * sum == budget, reachable with zero-weight rows) are routed to the
  * straddling path, never classified whole — so the scalable set is
  * row-for-row the greedy set (BudgetSampleSpec proves equality and
  * that the window input is only the straddling buckets).
  *
  * Every method also has a per-part-budget form (`*B`, taking a
  * broadcastable (part, budget) frame) — distinct budgets per part
  * ARE the mixture weights.
  */
object BudgetSample {

  /** Attach each part's budget as a column. `budgets` must have one
    * (part, budget) row per part — parts without a row select nothing
    * (inner join: no budget, no tokens).
    */
  private def withBudget(rows: DataFrame, budgets: DataFrame): DataFrame =
    rows.join(broadcast(budgets.select("part", "budget")), Seq("part"))

  private def constBudget(rows: DataFrame, budget: Long): DataFrame =
    rows.withColumn("budget", lit(budget))

  /** Exact greedy selection via one full window per part. Input
    * columns: part, pr (bigint priority bucket), key (total
    * tie-break), w (bigint weight). Keeps input columns.
    */
  def naive(rows: DataFrame, budget: Long): DataFrame =
    naiveCore(constBudget(rows, budget), rows.columns)

  def naiveB(rows: DataFrame, budgets: DataFrame): DataFrame =
    naiveCore(withBudget(rows, budgets), rows.columns)

  private def naiveCore(rb: DataFrame, out: Array[String]): DataFrame = {
    val w = Window.partitionBy("part").orderBy("pr", "key")
      .rowsBetween(Window.unboundedPreceding, -1)
    rb.withColumn("cb", coalesce(sum("w").over(w), lit(0L)))
      .filter(col("cb") < col("budget"))
      .select(out.map(col).toSeq: _*)
  }

  /** (part, pr) weight histogram with running prefix `cb` (weight in
    * all strictly-earlier buckets of the same part) and the budget
    * classification: keep (wholly under), drop (prefix already at or
    * past budget), edge (the straddling bucket — exact window needed).
    * Output is |parts|·|buckets| rows — broadcastable by construction.
    */
  def classify(rows: DataFrame, budget: Long): DataFrame =
    classifyCore(constBudget(rows, budget))

  def classifyB(rows: DataFrame, budgets: DataFrame): DataFrame =
    classifyCore(withBudget(rows, budgets))

  private def classifyCore(rb: DataFrame): DataFrame = {
    val wb = Window.partitionBy("part").orderBy("pr")
      .rowsBetween(Window.unboundedPreceding, -1)
    rb.groupBy("part", "pr")
      .agg(sum("w").as("bsum"), first("budget").as("budget"))
      .withColumn("cb", coalesce(sum("bsum").over(wb), lit(0L)))
      .withColumn("cls",
        when(col("cb") >= col("budget"), lit("drop"))
          .when(col("cb") + col("bsum") < col("budget"), lit("keep"))
          .otherwise(lit("edge")))
  }

  /** Rows of the straddling buckets only — exposed so the spec can
    * assert the exact-window input is ≈ 1/buckets of the corpus.
    */
  def edgeRows(rows: DataFrame, cls: DataFrame): DataFrame =
    rows.join(
      broadcast(cls.filter(col("cls") === "edge")
        .select("part", "pr", "cb", "budget")),
      Seq("part", "pr"))

  /** Exact greedy selection with the window confined to straddling
    * buckets. Identical output rows to [[naive]] (modulo row order).
    */
  def scalable(rows: DataFrame, budget: Long): DataFrame =
    scalableCore(rows, classify(rows, budget))

  def scalableB(rows: DataFrame, budgets: DataFrame): DataFrame =
    scalableCore(rows, classifyB(rows, budgets))

  private def scalableCore(rows: DataFrame, cls: DataFrame): DataFrame = {
    val kept = rows.join(
      broadcast(cls.filter(col("cls") === "keep").select("part", "pr")),
      Seq("part", "pr"))
    val wIn = Window.partitionBy("part").orderBy("pr", "key")
      .rowsBetween(Window.unboundedPreceding, -1)
    val edgeKept = edgeRows(rows, cls)
      .withColumn("cb2", col("cb") + coalesce(sum("w").over(wIn), lit(0L)))
      .filter(col("cb2") < col("budget"))
      .select(rows.columns.map(col).toSeq: _*)
    kept.select(rows.columns.map(col).toSeq: _*).unionByName(edgeKept)
  }
}
