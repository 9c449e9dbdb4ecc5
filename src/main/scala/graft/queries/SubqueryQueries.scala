package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** Subquery surface: scalar subqueries, IN-subqueries, HAVING, and a
  * streaming-executed tumbling window checked against the same oracle
  * as its batch twin.
  */
object SubqueryQueries {

  /** Scalar subquery: orders above the global average price. */
  private val qScalarSub = QueryDef.sqlChecked("q_scalar_subquery")(
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > " +
      "(SELECT 1.5 * " +
      "cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) " +
      "FROM orders) ORDER BY o_orderkey"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    val avgRow = ord.agg((lit(1.5) * dsum(col("o_totalprice"), 2) /
      count(lit(1))).as("thr"))
    ord.crossJoin(broadcast(avgRow))
      .filter(col("o_totalprice") > col("thr"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** IN-subquery: lineitems of urgent multi-item orders (HAVING). */
  private val qInSub = QueryDef.sqlChecked("q_in_subquery")(
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
      "WHERE l_orderkey IN (SELECT o_orderkey FROM orders " +
      "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderkey " +
      "HAVING count(*) >= 1) AND l_quantity > 40 " +
      "ORDER BY l_orderkey, l_linenumber"
  ) { (s, d) =>
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 1)
      .select(col("o_orderkey").as("l_orderkey"))
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 40)
      .join(urgent, Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Correlated-style per-group threshold: each customer's orders
    * above their own average (window-decorrelated form).
    */
  private val qCorrelated = QueryDef.sqlChecked("q_correlated_avg")(
    "SELECT o_custkey, o_orderkey, o_totalprice FROM (" +
      "SELECT o_custkey, o_orderkey, o_totalprice, " +
      "cast(sum(cast(o_totalprice as decimal(18,2))) OVER (PARTITION BY o_custkey) as double) / " +
      "count(*) OVER (PARTITION BY o_custkey) AS cavg FROM orders) " +
      "WHERE o_totalprice > cavg ORDER BY o_custkey, o_orderkey"
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
    Tables.orders(s, d)
      .withColumn("cavg",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double") / count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("cavg"))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Tumbling hourly window computed BY STRUCTURED STREAMING (file
    * stream → AvailableNow → memory sink) and checked against the
    * identical oracle as the batch q_events_hourly — the stream and
    * batch engines must agree exactly.
    */
  private val qStreamHourly = QueryDef.sqlChecked("q_stream_hourly")(
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, " +
      s"event_type, count(*) AS n, ${sqlDsum("value", 6)} AS sum_value " +
      "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
  ) { (s, d) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.apply(s, d, "events").schema
    val sinkName = "graft_stream_hourly"
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    // same either-vintage ts dispatch as Tables.events (nanos-as-long
    // vs native micros)
    val stream = (schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    })
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_dec"))
    graft.SessionConf.withStreamShuffle(s) {
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(sinkName)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00:00")
        .as("hour"), col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** Late/out-of-order data under a watermark, end to end in
    * STRUCTURED STREAMING: the events table is split into three files
    * (users %2=0, then %4=1, then %4=3) streamed as three ordered
    * micro-batches (maxFilesPerTrigger=1). Spark filters late rows
    * with the PREVIOUS batch's eviction watermark (one-batch lag since
    * 3.4), so batch 2's late filter is max(batch-0 ts) − 1 h: %4=3
    * rows in hourly windows already closed by it are DROPPED. Append
    * mode emits exactly the windows passed by the final eviction
    * watermark, max(all ts) − 1 h (a trailing empty batch runs once
    * the watermark advances past the last data batch). The oracle
    * replicates both rules:
    *   kept = g0 ∪ g1 ∪ (g2 where window_end > max(g0 ts) − 1 h)
    *   emit = kept windows with window_end ≤ max(all ts) − 1 h
    * (cutoffs µs-truncated on the DuckDB side to match Spark's µs
    * timestamps). A regression in the drop or eviction path changes
    * counts and fails the hash compare.
    */
  private val qStreamLate = QueryDef.sqlChecked("q_stream_late")(
    "WITH ev AS (SELECT ts, user_id, event_type, value, " +
      "date_trunc('hour', ts) AS h FROM events), " +
      "cut1 AS (SELECT max(date_trunc('microseconds', ts)) - INTERVAL 1 HOUR AS c " +
      "FROM ev WHERE user_id % 2 = 0), " +
      "cutf AS (SELECT max(date_trunc('microseconds', ts)) - INTERVAL 1 HOUR AS c FROM ev), " +
      "kept AS (SELECT * FROM ev WHERE user_id % 2 = 0 OR user_id % 4 = 1 " +
      "UNION ALL SELECT * FROM ev WHERE user_id % 4 = 3 " +
      "AND h + INTERVAL 1 HOUR > (SELECT c FROM cut1)) " +
      "SELECT strftime(h, '%Y-%m-%d %H:00:00') AS hour, event_type, " +
      s"count(*) AS n, ${sqlDsum("value", 6)} AS sum_value " +
      "FROM kept WHERE h + INTERVAL 1 HOUR <= (SELECT c FROM cutf) " +
      "GROUP BY h, event_type ORDER BY hour, event_type"
  ) { (s, d) =>
    val ev = graft.Tables.events(s, d)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
    val streamDir = graft.streaming.FileStreamFixture.write("late", d,
      "events: b0 user%2==0, b1 user%4==1, b2 user%4==3", Seq(
      ev.filter(col("user_id") % 2 === 0),
      ev.filter(col("user_id") % 4 === 1),
      ev.filter(col("user_id") % 4 === 3)))
    val sinkName = "graft_stream_late"
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(streamDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_dec"))
    graft.SessionConf.withStreamShuffle(s) {
      val q = stream.writeStream
        .outputMode("append")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(sinkName)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00:00")
        .as("hour"), col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** A continuous LEADERBOARD, executed by Structured Streaming:
    * global top-10 users by event count with the SORT + LIMIT inside
    * the streaming query (complete mode re-ranks the full aggregate
    * state every micro-batch — the only output mode where streaming
    * sort is legal, and the natural shape for a live "top sources /
    * heaviest keys" panel over an ingest stream). Three ordered
    * micro-batches force cross-batch count accumulation; the final
    * emitted table must equal the batch leaderboard over all events,
    * which is what the oracle computes. Counts tie-break on user_id
    * so the hash compare is engine-independent; the value sum rides
    * along exact-decimal.
    *
    * At scale: complete-mode re-emission costs O(distinct keys) per
    * batch — fine for leaderboard-sized aggregates (the use case);
    * unbounded key spaces belong to the append/update sinks the
    * other q_stream_* gates cover.
    */
  private val qStreamTopk = QueryDef.sqlChecked("q_stream_topk")(
    "SELECT user_id, count(*) AS n, " +
      s"${sqlDsum("value", 6)} AS sum_value " +
      "FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10"
  ) { (s, d) =>
    val ev = graft.Tables.events(s, d)
      .select(col("user_id"), col("value"))
    val streamDir = graft.streaming.FileStreamFixture.write("topk", d,
      "events: b0 user%3==0, b1 user%3==1, b2 user%3==2", Seq(
      ev.filter(col("user_id") % 3 === 0),
      ev.filter(col("user_id") % 3 === 1),
      ev.filter(col("user_id") % 3 === 2)))
    val sinkName = "graft_stream_topk"
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(streamDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_dec"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(10)
    graft.SessionConf.withStreamShuffle(s) {
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(sinkName)
      .select(col("user_id"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** NATIVE session windows, EXECUTED by Structured Streaming:
    * `session_window(ts, gap)` — Spark's built-in dynamic-gap session
    * operator (merging state store windows) — in append mode under a
    * watermark, against the same events table. Complements
    * `q_sessionize` (batch window-function sessionization) and
    * `StatefulSessionize` (custom flatMapGroupsWithState state): this
    * is the declarative form a user would reach for first.
    *
    * The events stream as TWO TIME-ORDERED micro-batches (ts before /
    * after Jan 21), so sessions spanning the boundary are built by
    * MERGING state-store session windows across batches — the hard
    * stateful path. A time-ordered split means no row is late (batch
    * 1's oldest row ≥ batch 0's newest), so the late-drop rule never
    * fires and the final emitted set is exactly the sessions whose
    * END (last event + 8 h gap) the final eviction watermark
    * (max ts − 24 h) passed — the trailing AvailableNow batch flushes
    * them. The oracle replicates sessionization over the whole table
    * (gap ≥ 8 h splits, µs-truncated timestamps to match Spark's) and
    * the eviction cutoff. A regression in cross-batch merge, gap
    * comparison, or eviction changes rows and fails the hash.
    */
  private val qStreamSession = QueryDef.sqlChecked("q_stream_session")(
    "WITH ev AS (SELECT user_id, date_trunc('microseconds', ts) AS ts, " +
      "value FROM events), " +
      "s AS (SELECT user_id, ts, value, CASE WHEN lag(ts) OVER w IS NULL " +
      "OR ts - lag(ts) OVER w >= INTERVAL 8 HOUR THEN 1 ELSE 0 END AS brk " +
      "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
      "g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS UNBOUNDED PRECEDING) AS sid FROM s), " +
      "agg AS (SELECT user_id, sid, min(ts) AS st, " +
      "max(ts) + INTERVAL 8 HOUR AS en, count(*) AS n, " +
      s"${sqlDsum("value", 6)} AS sum_value FROM g GROUP BY 1, 2), " +
      "cutf AS (SELECT max(ts) - INTERVAL 24 HOUR AS c FROM ev) " +
      "SELECT user_id, strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start, " +
      "strftime(en, '%Y-%m-%d %H:%M:%S') AS session_end, n, sum_value " +
      "FROM agg WHERE en <= (SELECT c FROM cutf) " +
      "ORDER BY user_id, session_start"
  ) { (s, d) =>
    val ev = graft.Tables.events(s, d)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cut = "2024-01-21 00:00:00"
    val streamDir = graft.streaming.FileStreamFixture.write("session", d,
      s"events time-split at $cut: b0 ts<cut, b1 ts>=cut", Seq(
        ev.filter(col("ts") < lit(cut)),
        ev.filter(col("ts") >= lit(cut))))
    val sinkName = "graft_stream_session"
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(streamDir)
      .withWatermark("ts", "24 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "8 hours"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_dec"))
    graft.SessionConf.withStreamShuffle(s) {
      val q = stream.writeStream
        .outputMode("append")
        .format("memory").queryName(sinkName)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(sinkName)
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n"), col("sum_dec").cast("double").as("sum_value"))
      .orderBy("user_id", "session_start")
  }

  val defs: Seq[QueryDef] = Seq(qScalarSub, qInSub, qCorrelated,
    qStreamHourly, qStreamLate, qStreamTopk, qStreamSession)
}
