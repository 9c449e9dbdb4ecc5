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
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_dec"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName(sinkName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sinkName)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00:00")
        .as("hour"), col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy("hour", "event_type")
  }

  val defs: Seq[QueryDef] = Seq(qScalarSub, qInSub, qCorrelated,
    qStreamHourly)
}
