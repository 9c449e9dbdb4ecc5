package graft.pipeline

import graft.functions.text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full E1 index-build lifecycle (SURVEY §3):
  * documents → token validation (fail-fast, cap 2042) → embed →
  * datapoint projection (id, vector, restricts, numeric restricts,
  * crowding tag) → index table + metadata table, two writes, one
  * linear DAG.
  *
  * Replaces the reference's orchestration
  * (/root/reference/vector_store/setup_vector_search.py:108-186): the
  * GCP index/endpoint lifecycle (D1–D5) becomes table writes; ids are
  * deterministic content hashes instead of UUIDv4 so reruns are
  * idempotent and golden tests stable.
  */
object Ingest {

  final case class TokenLimitExceeded(count: Long)
      extends RuntimeException(
        s"$count document(s) exceed the ${text.MaxTokens}-token cap")

  /** dim <= 0 means "infer": probe the embedder with the first
    * document and measure the returned vector — the reference's
    * runtime dimension discovery
    * (/root/reference/vector_store/setup_vector_search.py:35,
    * common/config.py:31).
    *
    * `bpeCounting` switches the 2042-token cap (common/config.py:57)
    * from the whitespace heuristic to real merge-based BPE counts
    * (BpeCodec) — the reference validates with a BPE tokenizer
    * (embeddings.py:52-60), and the two counters genuinely disagree
    * at the cap boundary: BPE splits unmerged character runs into
    * multiple tokens, so a document can pass the whitespace cap yet
    * exceed the model's real context limit (IngestSpec pins a case).
    * The actual cl100k_base merge table is public data but not
    * reachable from this zero-egress build; the committed fixture
    * vocabulary stands in, so absolute counts differ from tiktoken's
    * while the algorithm and the cap semantics are the reference's.
    */
  final case class Config(
      indexPath: String,
      metadataPath: String,
      dim: Int = 64,
      failFast: Boolean = true,
      bpeCounting: Boolean = false)

  /** Validate + embed + project. Returns (datapoints, metadata). */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      crowdingCol: String, cfg: Config): (DataFrame, DataFrame) = {
    val (dp, md, _) = prepareWithStage(docs, idCol, textCol, crowdingCol, cfg)
    (dp, md)
  }

  /** As [[prepare]], also returning the shared embedded stage so the
    * caller can persist/unpersist it around multi-sink writes.
    */
  def prepareWithStage(docs: DataFrame, idCol: String, textCol: String,
      crowdingCol: String, cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    val counter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (cfg.bpeCounting) text.bpeMergeCount else text.tokenCount
    val counted = docs.withColumn("__tokens", counter(col(textCol)))
    if (cfg.failFast) {
      // the reference aborts the whole job on the first invalid text
      // (embeddings.py:146-149)
      val bad = counted.filter(col("__tokens") > text.MaxTokens).count()
      if (bad > 0) throw TokenLimitExceeded(bad)
    }
    val valid = counted.filter(col("__tokens") <= text.MaxTokens)

    val dim =
      if (cfg.dim > 0) cfg.dim
      else {
        // probe the model with the first text and measure the vector
        // (setup_vector_search.py:35 discovers dims the same way)
        val probe = docs.select(col(textCol)).take(1).headOption
          .getOrElse(throw new IllegalArgumentException(
            "cannot infer embedding dim from an empty corpus; " +
              "pass Config(dim = ...) explicitly"))
          .getString(0)
        new FeatureHashEmbedder().embedOne(probe).length
      }
    val embedder = new FeatureHashEmbedder(dim = dim)
    val embedded = embedder.transform(valid, textCol)

    // id from (source id, text): md5(text) alone would collide for two
    // distinct documents with identical text, and duplicate ids fan
    // the top-k→metadata join out past k results
    val dpId = md5(concat_ws("\u0000", col(idCol).cast("string"),
      col(textCol)))

    val datapoints = embedded.select(
      dpId.as("datapoint_id"),
      col("embedding"),
      // categorical restricts, flattened for parquet-stat pushdown
      lit("text").as("file_type"),
      lit("documentation").as("content_type"),
      // numeric restricts
      lit(dim.toLong).as("embedding_dimension"),
      length(col(textCol)).cast("bigint").as("content_length"),
      col(crowdingCol).as("crowding_tag"))

    val metadata = embedded.select(
      dpId.as("datapoint_id"),
      col(idCol),
      col(textCol).as("content"),
      col("__tokens").as("token_count"),
      current_timestamp().as("created_at"))

    (datapoints, metadata, embedded)
  }

  /** Run the full build: two writes, ONE embedding pass — the shared
    * validate+embed stage is persisted before fanning out to the two
    * sinks (otherwise each write re-runs the embedder over the whole
    * corpus, doubling the most expensive stage).
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      crowdingCol: String, cfg: Config): Unit = {
    val (datapoints, metadata, embedded) =
      prepareWithStage(docs, idCol, textCol, crowdingCol, cfg)
    embedded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      datapoints.write.mode("overwrite").parquet(cfg.indexPath)
      metadata.write.mode("overwrite").parquet(cfg.metadataPath)
    } finally {
      embedded.unpersist()
    }
  }

  /** Query side of the lifecycle (E3) over a built index: embed the
    * query text, score vs the index, optional restrict filter, top-k,
    * join metadata.
    */
  def search(spark: SparkSession, cfg: Config, queryText: String, k: Int,
      restrict: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val index = spark.read.parquet(cfg.indexPath)
    val dim =
      if (cfg.dim > 0) cfg.dim
      else index.select(size(col("embedding"))).take(1).headOption
        .getOrElse(throw new IllegalArgumentException(
          s"cannot infer embedding dim from empty index at ${cfg.indexPath}; " +
            "pass Config(dim = ...) explicitly"))
        .getInt(0)
    val embedder = new FeatureHashEmbedder(dim = dim)
    val qVec = embedder.embedOne(queryText).map(_.toDouble).toSeq
    val filtered = restrict.map(index.filter).getOrElse(index)
    val hits = filtered.select(col("datapoint_id"), col("crowding_tag"),
      graft.functions.vectors.dotProduct(col("embedding"), typedLit(qVec))
        .as("score"))
      .orderBy(col("score").desc, col("datapoint_id"))
      .limit(k)
    hits.join(spark.read.parquet(cfg.metadataPath), "datapoint_id")
  }
}
