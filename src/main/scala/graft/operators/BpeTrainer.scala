package graft.operators

import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the distributed form of the merge-table
  * learning loop (Sennrich et al. 2016; the table
  * [[graft.functions.BpeCodec]] ENCODES with is exactly this loop's
  * output, so training completes the tokenizer story: the reference
  * consumes a pre-trained `cl100k_base`, a pipeline that OWNS its
  * corpus trains its own): start from characters, repeatedly count
  * adjacent symbol pairs across the corpus and merge the most
  * frequent one (ties broken deterministically: count desc, then
  * pair lexicographic — ASCII-binary in both engines).
  *
  * The Spark shape is what makes this trainable at 100 TB: the ONLY
  * corpus-sized pass is the initial word-frequency aggregate
  * (map-side combined); every training round then runs over the
  * DISTINCT-WORD frame (vocab-sized — orders of magnitude smaller
  * than the corpus) weighted by frequency: one pair explode +
  * partial-aggregable count, a top-1 argmax (TakeOrderedAndProject —
  * a bounded driver scalar per round, like every rule here), and a
  * vocab-sized rewrite applying the rule as a greedy left-to-right
  * fold inside each word. k rounds = k vocab passes, never k corpus
  * passes. (Production trainers subsample further; the plan is
  * unchanged.)
  */
object BpeTrainer {

  final case class Rule(a: String, b: String, count: Long)

  /** Greedy left-to-right application of ONE merge rule to a symbol
    * array: [a,a,a] under (a,a) → [aa, a] — an occurrence consumed by
    * a merge cannot start the next one. One `aggregate` fold carrying
    * (emitted, pending); empty-string pending = nothing held (symbols
    * are never empty — they start as single characters).
    */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit("").as("pend"))
    aggregate(syms, init,
      (st, s) => {
        val out = st.getField("out")
        val pend = st.getField("pend")
        when(pend === "", struct(out.as("out"), s.as("pend")))
          .when(pend === a && s === b,
            struct(concat(out, array(lit(a + b))).as("out"),
              lit("").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            s.as("pend")))
      },
      st => when(st.getField("pend") === "", st.getField("out"))
        .otherwise(concat(st.getField("out"),
          array(st.getField("pend")))))
  }

  /** Encode symbol arrays with a TRAINED rule table by applying each
    * rule as one exhaustive greedy pass, in training order. For a
    * trained table this IS rank-priority BPE encoding: a later rule's
    * product can never be an input of an earlier rule (each rule's
    * sides are characters or earlier products — the well-formedness
    * `BpeCodec`'s spec asserts), so the "merge the lowest-rank pair
    * present anywhere, repeat" loop and the sequential per-rule folds
    * produce identical output. k rules = k codegen'd folds in one
    * projection, no iteration state outside the expression.
    */
  def encodeWith(syms: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(syms) { case (c, (a, b)) => applyMerge(c, a, b) }

  /** The weighted distinct-word frame (word, f, syms) a training run
    * starts from — the one corpus-sized aggregation.
    */
  def wordFrame(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      .withColumn("syms",
        filter(split(col("word"), ""), c => c =!= ""))

  /** Train `rounds` merge rules. Returns one row per round:
    * (round, merge_a, merge_b, pair_count, corpus_symbols) where
    * corpus_symbols is the frequency-weighted symbol count AFTER
    * applying that round's rule — the quantity BPE training drives
    * down. Fails loudly if the corpus runs out of adjacent pairs.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    import spark.implicits._
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = wordFrame(docs, textCol).localCheckpoint()
    val out = (1 to rounds).map { r =>
      // pair (syms[i], syms[i+1]) via zip of the array with its tail
      val zipped = words.select(col("f"),
        explode(arrays_zip(
          expr("slice(syms, 1, greatest(size(syms) - 1, 0))"),
          expr("slice(syms, 2, greatest(size(syms) - 1, 0))"))).as("z"))
        .select(col("f"), col("z").getField("0").as("a"),
          col("z").getField("1").as("b"))
      val top = zipped.groupBy("a", "b")
        .agg(sum("f").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1).collect()
      require(top.nonEmpty, s"round $r: no adjacent pairs left to merge")
      val rule = Rule(top.head.getString(0), top.head.getString(1),
        top.head.getLong(2))
      words = words
        .withColumn("syms", applyMerge(col("syms"), rule.a, rule.b))
        .localCheckpoint()
      val symCount = words
        .agg(sum(col("f") * size(col("syms")))).head().getLong(0)
      (r.toLong, rule.a, rule.b, rule.count, symCount)
    }
    out.toDF("round", "merge_a", "merge_b", "pair_count",
      "corpus_symbols")
  }
}
