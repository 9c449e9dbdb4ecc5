package graft.operators

import graft.functions.text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LEXICAL SIDECAR for a serving layout — the inverted statistics a
  * hybrid (BM25 ∥ dense) retrieval endpoint keeps NEXT TO its vector
  * index so lexical scoring never re-tokenizes the corpus at query
  * time (the production hybrid-search shape: Vespa/Elastic co-locate
  * the postings with the ANN index; the reference's serving side is
  * dense-only, so this is the composition surface the RAG stack
  * `r_rag_e2e` gates, persisted for the deploy-once/query-many
  * lifecycle of [[Serving]]).
  *
  * Two frames, written under `<layout>/_graft_lexical/` (the `_`
  * prefix keeps them invisible to the layout's own parquet reads,
  * like the model sidecar and manifest):
  *  - `postings`: (doc_id, t, tf) — full term frequencies. At query
  *    time the scan filters `t IN (query terms)` — with the postings
  *    written partitioned-by-bucket on `t` this is a pushed-filter
  *    scan of a few term buckets, cost ∝ Σ df(term), corpus-size
  *    independent.
  *  - `dls`: (doc_id, dl) + the (total tokens, doc count) the BM25
  *    length norm divides by — one narrow row per doc.
  *
  * Scoring reuses the EXACT rational-arithmetic BM25 of the
  * `v_bm25_topk` gate ([[bm25Tail]] is the single shared arithmetic
  * site — integer idf/tf quotients, no libm), so sidecar-served
  * scores hash-match the tokenize-on-the-fly gate by construction.
  */
object Lexical {

  val Dir = "_graft_lexical"

  /** Tokenize `docs` once and persist the postings + doc-length
    * sidecar beside the layout at `path`. Postings bucket by term
    * hash (64 buckets) so a query-term filter prunes the scan.
    */
  def attach(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(text.tokens(col(textCol))).as("t"))
    toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(64L)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$Dir/postings")
    docs.select(col(idCol).as("doc_id"),
      text.tokenCount(col(textCol)).as("dl"))
      .write.mode("overwrite").parquet(s"$path/$Dir/dls")
  }

  /** Whether a layout carries the lexical sidecar. */
  def hasStats(spark: SparkSession, path: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, Dir, "postings"))

  /** BM25 scores (doc_id, score) for `terms` from the persisted
    * sidecar: the postings scan prunes to the query terms' buckets
    * (partition filter on the term-hash bucket + pushed `t IN`
    * filter), df comes from the filtered rows themselves, and the
    * totals are two broadcast scalars — no tokenize, no corpus scan.
    */
  def bm25FromStats(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    require(hasStats(spark, path),
      s"no lexical sidecar at $path/$Dir — run Lexical.attach first")
    // bucket ids via the engine's own xxhash64 (a local driver frame,
    // |terms| rows) — re-implementing the hash on the driver would be
    // a silent-divergence risk for zero gain
    import spark.implicits._
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(64L)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val postings = spark.read.parquet(s"$path/$Dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("t").isin(terms: _*))
      .select("doc_id", "t", "tf")
    val dls = spark.read.parquet(s"$path/$Dir/dls")
    bm25Tail(postings, dls)
  }

  /** The shared BM25 arithmetic over (doc_id, t, tf) term-frequency
    * rows and (doc_id, dl) lengths — identical to the `v_bm25_topk`
    * oracle's bscore CTE (k1=1.2, b=0.75 as the exact rationals
    * 22·tf·tt·1000 / (10·tf·tt + 3·tt + 9·dl·nn), idf as
    * (2(N−df)+1)·1000 / (2df+1); see ChunkingQueries for the
    * derivation). Every quotient is an integer floor-div, so scores
    * are engine-independent exact integers.
    */
  def bm25Tail(tf: DataFrame, dls: DataFrame): DataFrame = {
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val tot = dls.agg(sum("dl").cast("bigint").as("tt"),
      count(lit(1)).as("nn"))
    tf.join(broadcast(df), "t")
      .join(dls, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("idfs",
        expr("((2 * (nn - df) + 1) * 1000) div (2 * df + 1)"))
      .withColumn("tfr",
        expr("(22 * tf * tt * 1000) div (10 * tf * tt + 3 * tt + 9 * dl * nn)"))
      .groupBy("doc_id")
      .agg(sum(col("idfs") * col("tfr")).cast("bigint").as("score"))
  }
}
