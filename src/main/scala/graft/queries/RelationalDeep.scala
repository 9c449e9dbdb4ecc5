package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import org.apache.spark.sql.functions._

/** The deeper TPC-H plan shapes not yet covered by [[Relational]]:
  * EXISTS-driven aggregation (Q4), top-k over a 4-way join (Q10),
  * conditional CASE aggregation (Q12), agg-max-equality (Q15),
  * NOT-IN + distinct count (Q16), a decorrelated per-group scalar
  * threshold (Q17), a disjunctive multi-bracket join predicate (Q19),
  * a semi + anti self-reference on the fact table (Q21),
  * and anti-join + global scalar subquery (Q22). Adapted to the
  * reduced synthetic schema (no commitdate/receiptdate/shipmode/
  * partsupp/phone), keeping each query's characteristic plan shape.
  *
  * Scale notes: every query here either aggregates to a bounded
  * result or ends in ORDER BY+LIMIT (TakeOrderedAndProject — no full
  * sort); dims (part, supplier, nation) are fixed-size or
  * SF-sublinear so AQE broadcasts them; the only SF-linear shuffles
  * are the groupBy keys the semantics require.
  */
object RelationalDeep {

  /** Q4 shape: per-priority count of orders that HAVE a qualifying
    * lineitem (EXISTS → left-semi with a non-equi conjunct). The
    * correlated comparison l_shipdate > o_orderdate rides the join
    * condition, so Spark plans a semi hash join with the date
    * predicate as a join filter, not a post-join filter.
    */
  private val q4 = QueryDef.sqlChecked("q4_priority_exists")(
    "SELECT o_orderpriority, count(*) AS order_count FROM orders " +
      "WHERE o_orderdate >= timestamp '1996-01-01' " +
      "AND o_orderdate < timestamp '1996-07-01' " +
      "AND EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q10 shape: revenue lost to returns per customer — 4-way join
    * (SF-linear lineitem/orders against SF-sublinear customer and
    * fixed nation), hash agg on the customer key, top-20 via
    * TakeOrderedAndProject.
    */
  private val q10 = QueryDef.sqlChecked("q10_returned_revenue")(
    "SELECT c_custkey, c_name, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS revenue, " +
      "n_name FROM customer, orders, lineitem, nation " +
      "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
      "AND o_orderdate >= timestamp '1996-01-01' " +
      "AND o_orderdate < timestamp '1996-04-01' " +
      "AND l_returnflag = 'R' AND c_nationkey = n_nationkey " +
      "GROUP BY c_custkey, c_name, n_name " +
      "ORDER BY revenue DESC, c_custkey LIMIT 20"
  ) { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
        .as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q12 shape: conditional CASE aggregation — one pass splits line
    * counts into high/low priority classes (shipmode is absent from
    * the synthetic schema; l_linestatus is the grouping analog).
    * Integer sums cast to bigint on both engines (DuckDB widens
    * sum(int) to hugeint otherwise).
    */
  private val q12 = QueryDef.sqlChecked("q12_priority_class")(
    "SELECT l_linestatus, " +
      "cast(sum(case when o_orderpriority in ('1-URGENT','2-HIGH') " +
      "then 1 else 0 end) as bigint) AS high_line_count, " +
      "cast(sum(case when o_orderpriority not in ('1-URGENT','2-HIGH') " +
      "then 1 else 0 end) as bigint) AS low_line_count " +
      "FROM orders, lineitem WHERE o_orderkey = l_orderkey " +
      "AND l_shipdate >= timestamp '1997-01-01' " +
      "AND l_shipdate < timestamp '1998-01-01' " +
      "GROUP BY l_linestatus ORDER BY l_linestatus"
  ) { (s, d) =>
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(hi, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(!hi, 1).otherwise(0)).cast("long").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q15 shape: agg → global max → equality select (the "top
    * supplier" view). The max is one broadcast scalar row, so the
    * equality filter costs no second shuffle of the aggregate.
    */
  private val q15 = QueryDef.sqlChecked("q15_top_supplier")(
    "WITH rev AS (SELECT l_suppkey, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS total_revenue " +
      "FROM lineitem WHERE l_shipdate >= timestamp '1997-01-01' " +
      "AND l_shipdate < timestamp '1997-04-01' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_revenue FROM supplier, rev " +
      "WHERE s_suppkey = l_suppkey " +
      "AND total_revenue = (SELECT max(total_revenue) FROM rev) " +
      "ORDER BY s_suppkey"
  ) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy("l_suppkey")
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("__top"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("__top"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Q16 shape: NOT IN (≡ anti join on a non-null key) + per-group
    * DISTINCT count. The excluded-supplier set is fixed-size →
    * broadcast anti join; countDistinct expands to the two-phase
    * distinct aggregate.
    */
  private val q16 = QueryDef.sqlChecked("q16_part_suppliers")(
    "SELECT p_brand, p_type, p_size, " +
      "count(distinct l_suppkey) AS supplier_cnt " +
      "FROM part, lineitem WHERE p_partkey = l_partkey " +
      "AND p_brand <> 'Brand#13' AND p_type <> 'PROMO' " +
      "AND p_size in (1, 7, 14, 23, 36, 45) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier " +
      "WHERE s_acctbal < 0) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
  ) { (s, d) =>
    val badSupp = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("l_suppkey"))
    val parts = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 7, 14, 23, 36, 45))
    Tables.lineitem(s, d)
      .join(broadcast(badSupp), Seq("l_suppkey"), "left_anti")
      .join(parts, col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q17 shape: per-part scalar threshold (0.2 × that part's own mean
    * quantity), decorrelated into a grouped aggregate + equi join.
    * The threshold is derived from an EXACT decimal sum on both
    * engines and combined in the same operation order, so the
    * borderline l_quantity < threshold comparisons cannot flip
    * between engines.
    */
  private val q17 = QueryDef.sqlChecked("q17_small_quantity")(
    "SELECT " +
      s"${sqlDsum("l_extendedprice", 2)} / 7.0 AS avg_yearly " +
      "FROM lineitem, part WHERE p_partkey = l_partkey " +
      "AND p_brand = 'Brand#13' AND l_quantity < " +
      "(SELECT 0.2 * cast(sum(cast(l_quantity as decimal(18,2))) as double)" +
      " / count(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val thr = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * dsum(col("l_quantity"), 2) / count(lit(1)))
        .as("__thr"))
    val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
    li.join(brand, col("p_partkey") === col("l_partkey"))
      .join(thr, col("t_partkey") === col("l_partkey"))
      .filter(col("l_quantity") < col("__thr"))
      .agg((dsum(col("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"))
  }

  /** Q19 shape: disjunctive bracket predicates riding the join — the
    * OR of three (brand, size-range, quantity-range) brackets must
    * stay a single join condition so Catalyst can extract the common
    * p_partkey equi-conjunct and push the bracket residual into the
    * join filter.
    */
  private val q19 = QueryDef.sqlChecked("q19_disjunction")(
    "SELECT " +
      s"${sqlDsum("l_extendedprice*(1-l_discount)", 4)} AS revenue " +
      "FROM lineitem, part WHERE p_partkey = l_partkey AND (" +
      "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 " +
      "AND l_quantity BETWEEN 1 AND 11) OR " +
      "(p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 " +
      "AND l_quantity BETWEEN 10 AND 20) OR " +
      "(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 " +
      "AND l_quantity BETWEEN 20 AND 30))"
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val pt = Tables.part(s, d)
    val bracket =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(pt, col("p_partkey") === col("l_partkey") && bracket)
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 4)
        .as("revenue"))
  }

  /** Q22 shape: global scalar subquery (mean positive balance) +
    * NOT EXISTS (anti join against recent orders) + per-nation
    * aggregate (nationkey replaces the absent phone country code;
    * "idle" means no order since 1999 — the synthetic corpus gives
    * every customer SOME order, so the classic no-orders-ever form
    * would be vacuously empty). The scalar is one broadcast row; the
    * anti join's right side is just the recent orders' customer keys.
    */
  private val q22 = QueryDef.sqlChecked("q22_idle_customers")(
    "SELECT c_nationkey, count(*) AS numcust, " +
      s"${sqlDsum("c_acctbal", 2)} AS totacctbal FROM customer " +
      "WHERE c_acctbal > (SELECT " +
      "cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*) " +
      "FROM customer WHERE c_acctbal > 0) " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderdate >= timestamp '1999-01-01') " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"
  ) { (s, d) =>
    val cust = Tables.customer(s, d)
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal"), 2) / count(lit(1))).as("__thr"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("__thr"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1999-01-01"))
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), 2)
        .as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Q8 shape: national market share — the widest join in the suite
    * (8 relations: part, supplier, lineitem, orders, customer, nation
    * ×2, region) feeding a conditional-ratio aggregate per year. Both
    * the numerator (one nation's volume) and denominator (all volume)
    * are exact-decimal sums, so the ratio is one deterministic double
    * division. Dims are fixed-size → broadcast; the only SF-linear
    * shuffle is lineitem⋈orders.
    */
  private val q8 = QueryDef.sqlChecked("q8_market_share")(
    "SELECT o_year, " +
      "cast(sum(cast(case when nation = 'NATION_3' then volume else 0 end " +
      "as decimal(18,4))) as double) / " +
      "cast(sum(cast(volume as decimal(18,4))) as double) AS mkt_share " +
      "FROM (SELECT cast(extract(year from o_orderdate) as bigint) AS o_year, " +
      "l_extendedprice*(1-l_discount) AS volume, n2.n_name AS nation " +
      "FROM part, supplier, lineitem, orders, customer, " +
      "nation n1, nation n2, region " +
      "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey " +
      "AND l_orderkey = o_orderkey AND o_custkey = c_custkey " +
      "AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey " +
      "AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey " +
      "AND p_type = 'ECONOMY') GROUP BY o_year ORDER BY o_year"
  ) { (s, d) =>
    val custNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("__cnk"), col("n_regionkey"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("__snk"), col("n_name").as("nation"))
    val america = Tables.region(s, d).filter(col("r_name") === "AMERICA")
    val vol = Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(custNation, col("c_nationkey") === col("__cnk"))
      .join(america, col("n_regionkey") === col("r_regionkey"))
      .join(suppNation, col("s_nationkey") === col("__snk"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("volume"),
        col("nation"))
    vol.groupBy("o_year")
      .agg((dsum(when(col("nation") === "NATION_3", col("volume"))
          .otherwise(lit(0d)), 4) / dsum(col("volume"), 4))
        .as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q9 shape: profit by supplier nation and year. The synthetic
    * schema has no partsupp, so supply cost is proxied as
    * 0.1 × p_retailprice × quantity — the PLAN is the point: a
    * 5-way join with a LIKE filter on the part dimension, re-grouped
    * on (nation, year).
    */
  private val q9 = QueryDef.sqlChecked("q9_profit")(
    "SELECT n_name AS nation, " +
      "cast(extract(year from o_orderdate) as bigint) AS o_year, " +
      s"${sqlDsum("l_extendedprice*(1-l_discount) - 0.1*p_retailprice*l_quantity", 4)} " +
      "AS sum_profit FROM part, supplier, lineitem, orders, nation " +
      "WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey " +
      "AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey " +
      "AND p_name LIKE '%red%' " +
      "GROUP BY 1, 2 ORDER BY 1, 2"
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("%red%")),
        col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")) -
          lit(0.1) * col("p_retailprice") * col("l_quantity"), 4)
        .as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  /** Q6 shape: the forecasting-revenue-change scan — a single-table
    * multi-predicate filter into one global sum, the purest
    * pushdown-then-aggregate plan (every predicate reaches the
    * parquet scan; no shuffle except the final partial-sum merge).
    */
  private val q6 = QueryDef.sqlChecked("q6_forecast_revenue")(
    "SELECT " +
      s"${sqlDsum("l_extendedprice*l_discount", 4)} AS revenue " +
      "FROM lineitem WHERE l_shipdate >= timestamp '1997-01-01' " +
      "AND l_shipdate < timestamp '1998-01-01' " +
      "AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24"
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4)
        .as("revenue"))
  }

  /** Q13 shape: customer order-count distribution — a LEFT join with
    * a filter in the JOIN CONDITION (customers with zero qualifying
    * orders must survive with count 0), then an aggregate OVER an
    * aggregate. count(o_orderkey) counts non-null rows only, so the
    * null-extended rows of orderless customers land in the c_count=0
    * bucket on both engines.
    */
  private val q13 = QueryDef.sqlChecked("q13_order_distribution")(
    "SELECT c_count, count(*) AS custdist FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
      "LEFT JOIN orders ON c_custkey = o_custkey " +
      "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q21 shape: suppliers who kept orders waiting — the only TPC-H
    * query with BOTH a semi and an anti self-reference on the fact
    * table. A line is "late" when it shipped more than 60 days after
    * the order date (proxy for receiptdate > commitdate, which the
    * synthetic schema does not carry — same adaptation class as q9's
    * supply-cost proxy). For each late line of a finished order by a
    * NATION_3 supplier: EXISTS another supplier's line on the same
    * order (left-semi with the inequality conjunct riding the join
    * condition) and NOT EXISTS another supplier's LATE line on the
    * same order (left-anti over the same derived relation) — i.e. the
    * supplier is the sole cause of the wait. The `late` relation is
    * built once and reused on both sides of the anti join; both
    * probes are equi-joins on l_orderkey with the supplier
    * inequality as a join filter, so at scale each is one hash
    * shuffle on the order key, and the final ORDER BY+LIMIT is a
    * TakeOrderedAndProject (no full sort).
    */
  private val q21 = QueryDef.sqlChecked("q21_waiting_suppliers")(
    "WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE o_orderstatus = 'F' " +
      "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
      "SELECT s_name, count(*) AS numwait FROM late l1 " +
      "JOIN supplier ON s_suppkey = l1.l_suppkey " +
      "JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3' " +
      "WHERE EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey " +
      "AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM late l3 " +
      "WHERE l3.l_orderkey = l1.l_orderkey " +
      "AND l3.l_suppkey <> l1.l_suppkey) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
  ) { (s, d) =>
    val late = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val l1 = late
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.nation(s, d).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("l_orderkey", "l_suppkey", "s_name")
    val otherLine = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("__ok2"), col("l_suppkey").as("__sk2"))
    val otherLate = late
      .select(col("l_orderkey").as("__ok3"), col("l_suppkey").as("__sk3"))
    l1.join(otherLine, col("l_orderkey") === col("__ok2") &&
        col("l_suppkey") =!= col("__sk2"), "left_semi")
      .join(otherLate, col("l_orderkey") === col("__ok3") &&
        col("l_suppkey") =!= col("__sk3"), "left_anti")
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val defs: Seq[QueryDef] = Seq(q4, q6, q8, q9, q10, q12, q13, q15,
    q16, q17, q19, q21, q22)
}
