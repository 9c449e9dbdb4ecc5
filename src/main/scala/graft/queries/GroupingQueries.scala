package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Remaining aggregation/join surface: GROUPING SETS, pivot, ordered
  * string aggregation, exact distributed median, binned range join.
  */
object GroupingQueries {

  /** GROUPING SETS ((rf),(ls)) — via SQL text (engine SQL surface). */
  private val qGroupingSets = QueryDef.sqlChecked("q_grouping_sets")(
    "SELECT coalesce(l_returnflag, 'ALL') AS rf, " +
      "coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n, " +
      s"${sqlDsum("l_quantity", 2)} AS sum_qty FROM lineitem " +
      "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
      "ORDER BY rf, ls"
  ) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      "SELECT coalesce(l_returnflag, 'ALL') AS rf, " +
        "coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n, " +
        "cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty " +
        "FROM lineitem_gs " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) " +
        "ORDER BY rf, ls")
  }

  /** Pivot order status → columns (CASE-sum oracle). */
  private val qPivot = QueryDef.sqlChecked("q_pivot")(
    "SELECT o_orderpriority, " +
      "cast(sum(cast(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END as decimal(18,2))) as double) AS F, " +
      "cast(sum(cast(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END as decimal(18,2))) as double) AS O, " +
      "cast(sum(cast(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END as decimal(18,2))) as double) AS P " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice"), 2))
      .orderBy("o_orderpriority")
  }

  /** Ordered string aggregation (listagg shape). */
  private val qStringAgg = QueryDef.sqlChecked("q_string_agg")(
    "SELECT source, count(*) AS n, " +
      "string_agg(cast(doc_id as varchar), ',' ORDER BY doc_id) AS ids " +
      "FROM documents GROUP BY source ORDER BY source"
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string"))).as("ids"))
      .orderBy("source")
  }

  /** Exact distributed median via rank arithmetic — engine-agnostic
    * (no interpolation-formula bit drift; even counts average the two
    * middle values through exact decimals).
    */
  private val qMedian = QueryDef.sqlChecked("q_median_exact")(
    "WITH r AS (SELECT o_orderpriority, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn, " +
      "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) " +
      "SELECT o_orderpriority, " +
      "cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) AS median " +
      "FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"
  ) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
    val r = Tables.orders(s, d).select(
      col("o_orderpriority"), col("o_totalprice"),
      row_number().over(w.orderBy("o_totalprice", "o_orderkey")).as("rn"),
      count(lit(1)).over(w).as("n"))
    r.filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(n + 2) div 2"))
      .groupBy("o_orderpriority")
      .agg((dsum(col("o_totalprice"), 2) / count(lit(1))).as("median"))
      .orderBy("o_orderpriority")
  }

  /** Binned range join: orders falling inside 3-day windows. */
  private val qRangeJoin = QueryDef.sqlChecked("q_range_join")(
    "WITH iv AS (SELECT o_orderkey AS iv_id, epoch_us(o_orderdate) AS lo, " +
      "epoch_us(o_orderdate) + 259200000000 AS hi FROM orders " +
      "WHERE o_orderkey % 750 = 0) " +
      "SELECT iv_id, count(*) AS n FROM iv JOIN orders " +
      "ON epoch_us(o_orderdate) >= lo AND epoch_us(o_orderdate) < hi " +
      "GROUP BY iv_id ORDER BY iv_id"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    val points = ord.select(unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
    val intervals = ord.filter(col("o_orderkey") % 750 === 0)
      .select(col("o_orderkey").as("iv_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("lo"),
        (unix_micros(col("o_orderdate").cast("timestamp")) + 259200000000L).as("hi"))
    RangeJoin.binned(points, intervals, "us", "lo", "hi",
      binWidth = 86400000000L)
      .groupBy("iv_id").agg(count(lit(1)).as("n"))
      .orderBy("iv_id")
  }

  val defs: Seq[QueryDef] = Seq(qGroupingSets, qPivot, qStringAgg,
    qMedian, qRangeJoin)
}
