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

  /** Snapshot DIFF (CDC between two table versions): v2 is derived
    * from orders by a deterministic update rule (keys ≡ 0 mod 50 get
    * a price bump, keys ≡ 0 mod 97 are deleted); the diff is ONE full
    * outer join on the key comparing row fingerprints, classifying
    * every key as unchanged / updated / deleted — the
    * snapshot-reconciliation pass incremental pipelines run to emit a
    * change feed from full extracts. Output: per-class counts + key
    * checksums (any misclassification flips the hash).
    */
  private val qCdcDiff = QueryDef.sqlChecked("q_cdc_diff")(
    "WITH v1 AS (SELECT o_orderkey AS k, md5(concat(o_orderstatus, '|', " +
      "cast(cast(o_totalprice as decimal(18,2)) as varchar))) AS fp FROM orders), " +
      "v2 AS (SELECT o_orderkey AS k, md5(concat(o_orderstatus, '|', " +
      "cast(cast(o_totalprice + (CASE WHEN o_orderkey % 50 = 0 THEN 10.0 ELSE 0.0 END) " +
      "as decimal(18,2)) as varchar))) AS fp " +
      "FROM orders WHERE o_orderkey % 97 <> 0), " +
      "diff AS (SELECT coalesce(v1.k, v2.k) AS k, CASE " +
      "WHEN v2.k IS NULL THEN 'deleted' " +
      "WHEN v1.fp <> v2.fp THEN 'updated' ELSE 'unchanged' END AS change " +
      "FROM v1 FULL JOIN v2 ON v1.k = v2.k) " +
      "SELECT change, count(*) AS n, cast(sum(k) as bigint) AS key_sum " +
      "FROM diff GROUP BY change ORDER BY change"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    def fp(price: org.apache.spark.sql.Column) =
      md5(concat(col("o_orderstatus"), lit("|"),
        price.cast("decimal(18,2)").cast("string")))
    val v1 = ord.select(col("o_orderkey").as("k"),
      fp(col("o_totalprice")).as("fp1"))
    val v2 = ord.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k"),
        fp(col("o_totalprice") +
          when(col("o_orderkey") % 50 === 0, 10.0).otherwise(0.0)).as("fp2"))
    v1.join(v2, Seq("k"), "full_outer")
      .select(col("k"), when(col("fp2").isNull, "deleted")
        .when(col("fp1") =!= col("fp2"), "updated")
        .otherwise("unchanged").as("change"))
      .groupBy("change")
      .agg(count(lit(1)).as("n"), sum("k").cast("bigint").as("key_sum"))
      .orderBy("change")
  }

  /** Re-aggregable incremental rollup — the incremental-materialized-
    * view identity: DAILY partial aggregates (count + exact-decimal
    * sum) re-aggregated to months must equal the direct monthly
    * aggregate. The monthly rows come FROM the daily rollup (the
    * incremental path a 100 TB pipeline maintains instead of
    * rescanning history), and the per-row `consistent` flag compares
    * them against the direct computation inside the query — a
    * non-mergeable aggregate design flips the flag and the hash.
    */
  private val qIncrementalAgg = QueryDef.sqlChecked("q_incremental_agg")(
    "WITH daily AS (SELECT date_trunc('day', ts) AS dd, count(*) AS n, " +
      "sum(cast(value as decimal(18,6))) AS sv FROM events GROUP BY 1), " +
      "monthly AS (SELECT strftime(date_trunc('month', dd), '%Y-%m') AS m, " +
      "cast(sum(n) as bigint) AS n, cast(sum(sv) as double) AS sum_value " +
      "FROM daily GROUP BY 1), " +
      "direct AS (SELECT strftime(date_trunc('month', ts), '%Y-%m') AS m, " +
      "cast(count(*) as bigint) AS n, " +
      "cast(sum(cast(value as decimal(18,6))) as double) AS sum_value " +
      "FROM events GROUP BY 1) " +
      "SELECT monthly.m, monthly.n, monthly.sum_value, " +
      "(monthly.n = direct.n AND monthly.sum_value = direct.sum_value) AS consistent " +
      "FROM monthly JOIN direct ON monthly.m = direct.m ORDER BY monthly.m"
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("dd"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"))
    val monthly = daily
      .groupBy(date_format(date_trunc("month", col("dd")), "yyyy-MM").as("m"))
      .agg(sum("n").cast("bigint").as("n"),
        sum("sv").cast("double").as("sum_value"))
    val direct = ev
      .groupBy(date_format(date_trunc("month", col("ts")), "yyyy-MM").as("m"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    monthly.alias("i").join(direct.alias("dx"), Seq("m"))
      .select(col("m"), col("i.n").as("n"), col("i.sum_value").as("sum_value"),
        (col("i.n") === col("dx.n") &&
          col("i.sum_value") === col("dx.sum_value")).as("consistent"))
      .orderBy("m")
  }

  val defs: Seq[QueryDef] = Seq(dChunkShared, qFunnel, qHistogram,
    qCdcDiff, qIncrementalAgg)
}
