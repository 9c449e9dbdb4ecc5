package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.text
import org.apache.spark.sql.functions._

/** Final analytics batch: sub-document (chunk-level) dedup, event
  * funnel analysis, value histograms.
  */
object AnalyticsQueries {

  /** Chunk-level exact dedup: 32-token windows shared across
    * different documents (catches partial/substring duplication that
    * whole-document fingerprints miss).
    */
  private val dChunkShared = QueryDef.sqlChecked("d_dedup_chunks")(
    "SELECT md5(chunk_text) AS chunk_hash, " +
      "cast(count(DISTINCT doc_id) as bigint) AS n_docs, " +
      "min(doc_id) AS first_doc " +
      s"FROM (SELECT doc_id, ${ChunkingQueries.chunkTextSql} AS chunk_text " +
      s"FROM (${ChunkingQueries.chunkStartsSql})) " +
      "GROUP BY md5(chunk_text) HAVING count(DISTINCT doc_id) > 1 " +
      "ORDER BY chunk_hash"
  ) { (s, d) =>
    val withToks = Tables.documents(s, d)
      .select(col("doc_id"), text.tokens(col("text")).as("tk"))
    val chunks = withToks
      .withColumn("s", explode(sequence(lit(1),
        greatest(size(col("tk")) - (ChunkingQueries.ChunkTokens - 1), lit(1)),
        lit(ChunkingQueries.ChunkStride))))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("tk"), col("s"), lit(ChunkingQueries.ChunkTokens)))
          .as("chunk_text"))
    chunks.groupBy(md5(col("chunk_text")).as("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("chunk_hash")
  }

  /** Funnel: per-user first-view → first-click → first-purchase
    * ordering, counted by the deepest stage reached.
    */
  private val qFunnel = QueryDef.sqlChecked("q_events_funnel")(
    "SELECT stage, count(*) AS n_users FROM (" +
      "SELECT user_id, CASE " +
      "WHEN tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL " +
      "AND tv < tc AND tc < tp THEN 3 " +
      "WHEN tv IS NOT NULL AND tc IS NOT NULL AND tv < tc THEN 2 " +
      "WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS stage FROM (" +
      "SELECT user_id, " +
      "min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv, " +
      "min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc, " +
      "min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp " +
      "FROM events GROUP BY user_id)) GROUP BY stage ORDER BY stage"
  ) { (s, d) =>
    val us = unix_micros(col("ts"))
    val stages = Tables.events(s, d).groupBy("user_id").agg(
      min(when(col("event_type") === "view", us)).as("tv"),
      min(when(col("event_type") === "click", us)).as("tc"),
      min(when(col("event_type") === "purchase", us)).as("tp"))
    stages.select(
      when(col("tv").isNotNull && col("tc").isNotNull &&
        col("tp").isNotNull && col("tv") < col("tc") &&
        col("tc") < col("tp"), 3)
        .when(col("tv").isNotNull && col("tc").isNotNull &&
          col("tv") < col("tc"), 2)
        .when(col("tv").isNotNull, 1)
        .otherwise(0).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** Equi-width histogram of order totals (10 buckets over the
    * observed range; deterministic double bucketing).
    */
  private val qHistogram = QueryDef.sqlChecked("q_histogram")(
    "WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders) " +
      "SELECT CASE WHEN hi = lo THEN 0 ELSE " +
      "least(cast(floor((o_totalprice - lo) / (hi - lo) * 10) as bigint), 9) END AS bucket, " +
      "count(*) AS n FROM orders, mm GROUP BY 1 ORDER BY bucket"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    val mm = ord.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    ord.crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), lit(0L)) // degenerate range:
        // Spark /0 → NULL but DuckDB 0/0 → NaN — guard both sides
        .otherwise(least(floor((col("o_totalprice") - col("lo")) /
          (col("hi") - col("lo")) * 10).cast("bigint"), lit(9L)))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val defs: Seq[QueryDef] = Seq(dChunkShared, qFunnel, qHistogram)
}
