package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics in batch form (the same frames the
  * streaming path computes incrementally): tumbling time windows,
  * JSON-ish property extraction, per-user gap analysis (lag).
  */
object EventsQueries {

  /** Tumbling 1-hour windows per event type. */
  private val qHourly = QueryDef.sqlChecked("q_events_hourly")(
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, " +
      s"event_type, count(*) AS n, ${sqlDsum("value", 6)} AS sum_value " +
      "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:00:00").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** Property extraction from the JSON-ish props string (regex — no
    * JSON extension dependency on the oracle side).
    */
  private val qProps = QueryDef.sqlChecked("q_events_props")(
    "SELECT k, count(*) AS n FROM (SELECT cast(regexp_extract(props, " +
      "'\"k\": ([0-9]+)', 1) as bigint) AS k FROM events) " +
      "GROUP BY k ORDER BY k"
  ) { (s, d) =>
    Tables.events(s, d)
      .select(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        .cast("bigint").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  /** Per-user inter-event gap via lag() — microsecond-exact. */
  private val qGaps = QueryDef.sqlChecked("q_events_gaps")(
    "SELECT user_id, event_id, epoch_us(ts) - lag(epoch_us(ts)) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us " +
      "FROM events ORDER BY user_id, event_id"
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** Weekly cohort retention — the classic product-analytics matrix:
    * cohort = a user's first active week, age = weeks since cohort;
    * cell = how many of the cohort's users were active at that age.
    * Two aggregations and a broadcast-able cohort join (users ≪
    * events); age arithmetic in integer microseconds so both engines
    * agree exactly (DuckDB date_trunc('week') yields a DATE — cast to
    * timestamp before epoch_us).
    */
  private val qRetention = QueryDef.sqlChecked("q_retention")(
    "WITH wk AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events), " +
      "coh AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id) " +
      "SELECT strftime(c.cw, '%Y-%m-%d') AS cohort, " +
      "(epoch_us(cast(k.w as timestamp)) - epoch_us(cast(c.cw as timestamp))) // 604800000000 AS age_weeks, " +
      "count(*) AS n_users " +
      "FROM wk k JOIN coh c ON k.user_id = c.user_id " +
      "GROUP BY 1, 2 ORDER BY 1, 2"
  ) { (s, d) =>
    val wk = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    val coh = wk.groupBy("user_id").agg(min("w").as("cw"))
    // coh is one row PER USER — it scales with the data, so no
    // broadcast hint (SCALE.md §3: true dimensions only); AQE picks
    // the strategy from runtime stats at whatever the actual size is
    wk.join(coh, "user_id")
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort"),
        expr("(unix_micros(w) - unix_micros(cw)) div 604800000000")
          .as("age_weeks"))
      .groupBy("cohort", "age_weeks")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "age_weeks")
  }

  val defs: Seq[QueryDef] = Seq(qHourly, qProps, qGaps, qRetention)
}
