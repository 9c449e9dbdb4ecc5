package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AdvancedSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before left ts") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (1L, 11L, ts("2024-01-01 10:00:10")),
      (2L, 20L, ts("2024-01-01 10:00:01"))
    ).toDF("user_id", "event_id", "ts")
    val quotes = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 10:00:10")), // equal ts → must match 11
      (3L, 300L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = AsOfJoin(trades, quotes, Seq("user_id"), "ts",
      carry = Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(100L), 11L -> Some(101L), 20L -> None))
  }

  test("as-of join preserves every left row") {
    val out = SparkEntry.queries("q_asof_join")(spark, sf)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
  }

  test("sessions never contain a gap above the threshold") {
    val sess = SparkEntry.queries("q_sessionize")(spark, sf)
    // each session's span divided by events can't prove no-gap, so
    // recompute: max intra-session lag must be <= 30 min
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val m = e.withColumn("gap", col("us") - lag("us", 1).over(w))
      .withColumn("is_new", when(col("gap").isNull ||
        col("gap") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bad = m.filter(col("is_new") === 0 && col("gap") > 1800000000L)
    assert(bad.count() == 0)
    assert(sess.agg(sum("n_events")).first().getLong(0) == e.count())
  }

  test("approx distinct stays inside the gate's 5% bound (rsd = 2%)") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .select("exact_cust", "within_5pct").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, ok) =>
      assert(ok == 1L, s"HLL error above 5% for a group with exact=$e")
    }
  }
}
