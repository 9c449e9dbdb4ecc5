package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the TPC-H-ish corpus: hash
  * aggregation, multi-way joins (broadcast dims), semi/anti joins,
  * ranking + running windows, rollup, distinct aggregation, set ops.
  *
  * Every double aggregate goes through [[graft.Exact]] so results are
  * bit-identical to the DuckDB oracle regardless of partitioning /
  * addition order — the same trick keeps results stable on a real
  * cluster where partition counts differ run to run.
  */
object Relational {

  /** TPC-H Q1 analog: scan → filter → hash agg (partial+final for free). */
  private val q1 = QueryDef.sqlChecked("q1_pricing_summary")(
    "SELECT l_returnflag, l_linestatus, " +
      s"${sqlDsum("l_quantity", 2)} AS sum_qty, " +
      s"${sqlDsum("l_extendedprice", 2)} AS sum_base_price, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS sum_disc_price, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)*(1+l_tax)", 6)} AS sum_charge, " +
      s"${sqlDsum("l_quantity", 2)}/count(*) AS avg_qty, " +
      "count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")) *
          (lit(1d) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3 analog: selective filter → join → agg → top-k. No join
    * hints: customer/orders scale with SF, so AQE picks broadcast vs
    * shuffle from runtime sizes; the final ORDER BY + LIMIT plans as
    * TakeOrderedAndProject (no full sort).
    */
  private val q3 = QueryDef.sqlChecked("q3_top_revenue")(
    "SELECT l_orderkey, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS revenue, " +
      "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority " +
      "FROM customer, orders, lineitem " +
      "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey " +
      "AND l_orderkey = o_orderkey AND o_orderdate < timestamp '1998-06-01' " +
      "AND l_shipdate > timestamp '1998-06-01' " +
      "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
      "ORDER BY revenue DESC, l_orderkey LIMIT 10"
  ) { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-06-01"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-06-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 analog: 6-way join; fixed-size dims (region/nation/
    * supplier chain) broadcast, SF-scaling tables (orders/customer)
    * join under AQE's runtime choice. */
  private val q5 = QueryDef.sqlChecked("q5_region_revenue")(
    "SELECT n_name, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS revenue " +
      "FROM customer, orders, lineitem, supplier, nation, region " +
      "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
      "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
      "AND r_name = 'ASIA' " +
      "AND o_orderdate >= timestamp '1996-01-01' " +
      "AND o_orderdate < timestamp '1998-01-01' " +
      "GROUP BY n_name ORDER BY revenue DESC, n_name"
  ) { (s, d) =>
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    val cust = Tables.customer(s, d)
    // sup scales with SF (TPC-H supplier = 10k rows/SF) — not a true
    // dimension, so no broadcast hint; AQE decides from runtime size
    Tables.lineitem(s, d)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Left-semi join (EXISTS): customers having at least one finished order. */
  private val qSemi = QueryDef.sqlChecked("q_semi_join")(
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') " +
      "ORDER BY c_custkey"
  ) { (s, d) =>
    val ord = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no in-progress order. */
  private val qAnti = QueryDef.sqlChecked("q_anti_join")(
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') " +
      "ORDER BY c_custkey"
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Ranking window: top-3 orders per customer by price (W1 analog). */
  private val qWindowRank = QueryDef.sqlChecked("q_window_rank")(
    "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "cast(row_number() OVER (PARTITION BY o_custkey " +
      "ORDER BY o_totalprice DESC, o_orderkey) as bigint) AS rn FROM orders) " +
      "WHERE rn <= 3 ORDER BY o_custkey, rn"
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("bigint").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running-total window (analytic frame), exact-decimal accumulation so
    * the running sum is order-stable. (l_orderkey, l_linenumber) is NOT
    * unique in this synthetic lineitem, so l_quantity joins the window
    * order: remaining ties then have equal quantity and any peer
    * permutation yields identical running values — without it, each
    * engine's parallel window exec breaks ties its own way and the
    * intermediate sums flake.
    */
  private val qWindowRunning = QueryDef.sqlChecked("q_window_running")(
    "SELECT l_suppkey, l_orderkey, l_linenumber, " +
      "cast(sum(cast(l_quantity as decimal(18,2))) OVER " +
      "(PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_qty " +
      "FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber"
  ) { (s, d) =>
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** ROLLUP grouping sets with coalesced totals rows. */
  private val qRollup = QueryDef.sqlChecked("q_rollup")(
    "SELECT coalesce(l_returnflag, 'ALL') AS rf, " +
      "coalesce(l_linestatus, 'ALL') AS ls, " +
      s"${sqlDsum("l_quantity", 2)} AS sum_qty, count(*) AS n " +
      "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
      "ORDER BY rf, ls"
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")
  }

  /** Exact distinct aggregation (expand + two-phase agg in Spark). */
  private val qDistinct = QueryDef.sqlChecked("q_distinct_agg")(
    "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, " +
      "count(*) AS n FROM orders GROUP BY o_orderpriority " +
      "ORDER BY o_orderpriority"
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** INTERSECT (set semantics): customers active in both years. */
  private val qIntersect = QueryDef.sqlChecked("q_intersect")(
    "SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1996-01-01' " +
      "AND o_orderdate < timestamp '1997-01-01' " +
      "INTERSECT " +
      "SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1997-01-01' " +
      "AND o_orderdate < timestamp '1998-01-01' " +
      "ORDER BY o_custkey"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    val y96 = ord.filter(col("o_orderdate") >= lit("1996-01-01") &&
      col("o_orderdate") < lit("1997-01-01")).select("o_custkey")
    val y97 = ord.filter(col("o_orderdate") >= lit("1997-01-01") &&
      col("o_orderdate") < lit("1998-01-01")).select("o_custkey")
    y96.intersect(y97).orderBy("o_custkey")
  }

  /** EXCEPT (set semantics): customers active in 1996 but not 1997. */
  private val qExcept = QueryDef.sqlChecked("q_except")(
    "SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1996-01-01' " +
      "AND o_orderdate < timestamp '1997-01-01' " +
      "EXCEPT " +
      "SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1997-01-01' " +
      "AND o_orderdate < timestamp '1998-01-01' " +
      "ORDER BY o_custkey"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    val y96 = ord.filter(col("o_orderdate") >= lit("1996-01-01") &&
      col("o_orderdate") < lit("1997-01-01")).select("o_custkey")
    val y97 = ord.filter(col("o_orderdate") >= lit("1997-01-01") &&
      col("o_orderdate") < lit("1998-01-01")).select("o_custkey")
    y96.except(y97).orderBy("o_custkey")
  }

  /** UNION ALL then re-aggregate (corpus-append shape from SURVEY §2.9). */
  private val qUnionAgg = QueryDef.sqlChecked("q_union_agg")(
    "SELECT k, count(*) AS n FROM " +
      "(SELECT o_custkey AS k FROM orders UNION ALL SELECT c_custkey FROM customer) " +
      "GROUP BY k ORDER BY k"
  ) { (s, d) =>
    Tables.orders(s, d).select(col("o_custkey").as("k"))
      .unionAll(Tables.customer(s, d).select(col("c_custkey").as("k")))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  /** TPC-H Q18 analog: large orders via HAVING + join back. */
  private val q18 = QueryDef.sqlChecked("q18_large_orders")(
    "SELECT c_custkey, c_name, o_orderkey, " +
      s"${sqlDsum("l_quantity", 2)} AS total_qty " +
      "FROM customer, orders, lineitem " +
      "WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey " +
      "AND o_orderkey IN (SELECT l_orderkey FROM lineitem " +
      "GROUP BY l_orderkey HAVING sum(cast(l_quantity as decimal(18,2))) > 150) " +
      "GROUP BY c_custkey, c_name, o_orderkey ORDER BY c_custkey, o_orderkey"
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .filter(col("q") > 150)
      .select("l_orderkey")
    // no join hints: orders is a fact table (forced broadcast breaks
    // at scale) but small at test SFs (forced shuffle wastes time) —
    // AQE picks broadcast vs shuffle from runtime sizes
    li.join(big, Seq("l_orderkey"), "left_semi")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "o_orderkey")
      .agg(dsum(col("l_quantity"), 2).as("total_qty"))
      .orderBy("c_custkey", "o_orderkey")
  }

  /** Supplier league table: revenue share of each supplier's nation. */
  private val qSupplierShare = QueryDef.sqlChecked("q_supplier_share")(
    "SELECT s_suppkey, s_name, n_name, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS revenue, " +
      "cast(rank() OVER (PARTITION BY n_name ORDER BY " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} DESC, s_suppkey) as bigint) AS rank_in_nation " +
      "FROM lineitem, supplier, nation " +
      "WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey " +
      "GROUP BY s_suppkey, s_name, n_name ORDER BY s_suppkey"
  ) { (s, d) =>
    val w = Window.partitionBy("n_name")
    val agg = Tables.lineitem(s, d)
      // supplier scales with SF — no broadcast hint (AQE decides)
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_suppkey", "s_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
        .as("revenue"))
    agg.withColumn("rank_in_nation",
      rank().over(w.orderBy(col("revenue").desc, col("s_suppkey")))
        .cast("bigint"))
      .orderBy("s_suppkey")
  }

  /** Left outer join with NULL-side aggregation semantics: every
    * customer, zero-filled order counts (count(col) skips NULLs).
    */
  private val qLeftJoin = QueryDef.sqlChecked("q_left_join")(
    "SELECT c_custkey, count(o_orderkey) AS n_orders, " +
      "coalesce(" + sqlDsum("o_totalprice", 2) + ", 0.0) AS total " +
      "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
      "AND o_orderstatus = 'P' " +
      "GROUP BY c_custkey ORDER BY c_custkey"
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice"), 2), lit(0.0)).as("total"))
      .orderBy("c_custkey")
  }

  /** Full outer join of two aggregate views (keys present on either
    * side survive; both sides NULL-padded).
    */
  private val qFullOuter = QueryDef.sqlChecked("q_full_outer")(
    "SELECT coalesce(a.k, b.k) AS k, a.n_orders, b.n_lines FROM " +
      "(SELECT o_custkey AS k, count(*) AS n_orders FROM orders " +
      "WHERE o_orderstatus = 'P' GROUP BY 1) a FULL OUTER JOIN " +
      "(SELECT o_custkey AS k, count(*) AS n_lines FROM orders " +
      "WHERE o_orderstatus = 'F' GROUP BY 1) b ON a.k = b.k " +
      "ORDER BY k"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
    val a = ord.filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey").as("ka"))
      .agg(count(lit(1)).as("n_orders"))
    val b = ord.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("kb"))
      .agg(count(lit(1)).as("n_lines"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(coalesce(col("ka"), col("kb")).as("k"),
        col("n_orders"), col("n_lines"))
      .orderBy("k")
  }

  /** TPC-H Q7 shape: trade volume between every (supplier nation,
    * customer nation) pair over a two-year shipping window — the
    * 6-table join chain (lineitem→orders→customer + lineitem→supplier,
    * nation twice). Shape at scale: the date filter pushes to the
    * lineitem scan, nation is broadcast on both legs, and the
    * aggregation shuffles once on the (nation, nation, year) key.
    */
  private val q7NationTrade = QueryDef.sqlChecked("q7_nation_trade")(
    "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, " +
      "cast(year(l_shipdate) as bigint) AS l_year, " +
      "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) AS revenue " +
      "FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation ns ON s_nationkey = ns.n_nationkey " +
      "JOIN nation nc ON c_nationkey = nc.n_nationkey " +
      "WHERE ns.n_name <> nc.n_name " +
      "AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31' " +
      "GROUP BY 1, 2, 3 " +
      "ORDER BY revenue DESC, supp_nation, cust_nation, l_year LIMIT 20"
  ) { (s, d) =>
    val disc = col("l_extendedprice") * (lit(1d) - col("l_discount"))
    val ns = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("supp_nation"))
    val nc = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between("1996-01-01", "1997-12-31"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), "s_nationkey")
      .join(broadcast(nc), "c_nationkey")
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(dsum(disc, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("supp_nation"), col("cust_nation"),
        col("l_year"))
      .limit(20)
  }

  /** RANGE-frame window: per customer, each order with the sum of
    * that customer's order totals over the trailing 30 days — the
    * value-based frame (`RANGE 30 PRECEDING` over epoch days) no ROWS
    * frame can express. Range frames include ALL value-peers, so
    * same-day ties contribute identically on both engines regardless
    * of row order — deterministic by construction, no tie-break
    * gymnastics needed in the frame itself.
    */
  private val qWindowRange = QueryDef.sqlChecked("q_window_range")(
    "SELECT o_custkey, o_orderkey, d, " +
      "cast(sum(cast(o_totalprice as decimal(18,2))) OVER (" +
      "PARTITION BY o_custkey ORDER BY d " +
      "RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) as double) AS trailing_30d " +
      "FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "epoch_us(cast(o_orderdate as timestamp)) // 86400000000 AS d FROM orders) " +
      "ORDER BY o_custkey, o_orderkey"
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("d")
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("d", expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .withColumn("trailing_30d",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "d", "trailing_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  val defs: Seq[QueryDef] = Seq(q1, q3, q5, qSemi, qAnti, qWindowRank,
    qWindowRunning, qRollup, qDistinct, qIntersect, qExcept, qUnionAgg,
    q18, qSupplierShare, qLeftJoin, qFullOuter, q7NationTrade, qWindowRange)
}
