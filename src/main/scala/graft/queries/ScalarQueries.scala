package graft.queries

import graft.{QueryDef, Tables}
import graft.Exact._
import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Scalar-function surface coverage (string / date / array / math)
  * plus the skew-salted join — every query oracle-checked. Functions
  * chosen to be bit-deterministic across engines (no libm-dependent
  * transcendentals, no .5-boundary rounding).
  */
object ScalarQueries {

  /** String functions over part. */
  private val qString = QueryDef.sqlChecked("q_string_funcs")(
    "SELECT p_partkey, upper(p_name) AS uname, " +
      "replace(p_name, ' ', '_') AS underscored, " +
      "lpad(p_brand, 10, '*') AS padded, " +
      "substring(p_name, 2, 5) AS mid, " +
      "cast(instr(p_name, 'e') as bigint) AS epos, " +
      "p_type || ':' || p_brand AS tagged, " +
      "p_type LIKE 'PROMO%' AS is_promo, " +
      "cast(length(p_name) as bigint) AS nlen " +
      "FROM part ORDER BY p_partkey"
  ) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("uname"),
      regexp_replace(col("p_name"), " ", "_").as("underscored"),
      lpad(col("p_brand"), 10, "*").as("padded"),
      substring(col("p_name"), 2, 5).as("mid"),
      instr(col("p_name"), "e").cast("bigint").as("epos"),
      concat(col("p_type"), lit(":"), col("p_brand")).as("tagged"),
      col("p_type").like("PROMO%").as("is_promo"),
      length(col("p_name")).cast("bigint").as("nlen"))
      .orderBy("p_partkey")
  }

  /** TPC-H Q14 analog: promo revenue share (broadcast part join). */
  private val qPromo = QueryDef.sqlChecked("q_promo_revenue")(
    "SELECT 100.0 * " +
      "cast(sum(cast(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END as decimal(18,4))) as double) / " +
      "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) AS promo_pct " +
      "FROM lineitem, part WHERE l_partkey = p_partkey"
  ) { (s, d) =>
    val disc = col("l_extendedprice") * (lit(1d) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), // part scales with SF: AQE decides
        col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0d))
          .cast("decimal(18,4)")).cast("double") /
        sum(disc.cast("decimal(18,4)")).cast("double")).as("promo_pct"))
  }

  /** Date/time functions over orders. */
  private val qDate = QueryDef.sqlChecked("q_date_funcs")(
    "SELECT o_orderkey, cast(year(o_orderdate) as bigint) AS y, " +
      "cast(month(o_orderdate) as bigint) AS m, " +
      "cast(day(o_orderdate) as bigint) AS dom, " +
      "cast(date_part('dow', o_orderdate) + 1 as bigint) AS dow, " +
      "cast(quarter(o_orderdate) as bigint) AS q, " +
      "cast(date_diff('day', timestamp '1995-01-01', o_orderdate) as bigint) AS days_since, " +
      "strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end " +
      "FROM orders ORDER BY o_orderkey"
  ) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("bigint").as("y"),
      month(col("o_orderdate")).cast("bigint").as("m"),
      dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
      dayofweek(col("o_orderdate")).cast("bigint").as("dow"),
      quarter(col("o_orderdate")).cast("bigint").as("q"),
      datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("bigint").as("days_since"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")
  }

  /** Array functions over document token lists. */
  private val qArray = QueryDef.sqlChecked("q_array_funcs")(
    "SELECT doc_id, cast(len(tk) as bigint) AS n_tokens, " +
      "cast(len(list_distinct(tk)) as bigint) AS n_distinct, " +
      "list_sort(tk)[1] AS first_sorted, " +
      "array_to_string(list_sort(tk)[1:3], '-') AS top3, " +
      "list_contains(tk, 'spark') AS has_spark " +
      "FROM (SELECT doc_id, " +
      "list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk " +
      "FROM documents) ORDER BY doc_id"
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.text.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("bigint").as("n_distinct"),
        element_at(sort_array(col("tk")), 1).as("first_sorted"),
        concat_ws("-", slice(sort_array(col("tk")), 1, 3)).as("top3"),
        array_contains(col("tk"), "spark").as("has_spark"))
      .orderBy("doc_id")
  }

  /** Math functions (bit-deterministic set only). */
  private val qMath = QueryDef.sqlChecked("q_math_funcs")(
    "SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS adisc, " +
      "cast(floor(l_extendedprice) as bigint) AS fl, " +
      "cast(ceil(l_extendedprice) as bigint) AS ce, " +
      "sqrt(l_quantity) AS sq, l_quantity * l_quantity AS q2, " +
      "greatest(l_tax, l_discount) AS gmax, least(l_tax, l_discount) AS gmin, " +
      "l_orderkey % 7 AS m7 " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber"
  ) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - 0.05).as("adisc"),
      floor(col("l_extendedprice")).as("fl"),
      ceil(col("l_extendedprice")).as("ce"),
      sqrt(col("l_quantity")).as("sq"),
      (col("l_quantity") * col("l_quantity")).as("q2"),
      greatest(col("l_tax"), col("l_discount")).as("gmax"),
      least(col("l_tax"), col("l_discount")).as("gmin"),
      (col("l_orderkey") % 7).as("m7"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Salted skew join ≡ plain equi-join (oracle proves equality). */
  private val qSalted = QueryDef.sqlChecked("q_salted_join")(
    "SELECT l_suppkey, s_name, " +
      s"${sqlDsum("l_extendedprice", 2)} AS rev, count(*) AS n " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "GROUP BY l_suppkey, s_name ORDER BY l_suppkey"
  ) { (s, d) =>
    val small = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    SaltedJoin(Tables.lineitem(s, d), small, "l_suppkey",
      saltSrc = col("l_orderkey"), salts = 8)
      .groupBy("l_suppkey", "s_name")
      .agg(dsum(col("l_extendedprice"), 2).as("rev"),
        count(lit(1)).as("n"))
      .orderBy("l_suppkey")
  }

  /** Z-order (Morton) clustering key — the multi-dim layout key used
    * by Layout.writeZOrdered; bit-exact in both engines.
    */
  private val qZorder = QueryDef.sqlChecked("q_zorder")(
    "SELECT o_orderkey, " +
      graft.operators.Layout.zValueSql("o_custkey", "days") + " AS z " +
      "FROM (SELECT o_orderkey, o_custkey, " +
      "date_diff('day', timestamp '1995-01-01', o_orderdate) AS days " +
      "FROM orders) ORDER BY o_orderkey"
  ) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("bigint").as("days"))
      .select(col("o_orderkey"),
        graft.operators.Layout.zValue(col("o_custkey"), col("days")).as("z"))
      .orderBy("o_orderkey")
  }

  /** Map functions (the reference's dict-merge firestore_ops.py:51,79
    * ≈ map_concat): per-event maps built, merged, and read back.
    * DuckDB's MAP type hashes differently, so the outputs are the
    * EXTRACTED scalars — the oracle recomputes them relationally while
    * the Spark side must thread the values through map_concat /
    * element_at / map_keys correctly to match.
    */
  private val qMapFuncs = QueryDef.sqlChecked("q_map_funcs")(
    "SELECT event_id, cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) as bigint) AS k_val, " +
      "event_type AS t_val, cast(2 as bigint) AS n_entries, 'k,t' AS keys " +
      "FROM events ORDER BY event_id"
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .withColumn("m1", map(lit("k"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)))
      .withColumn("m2", map(lit("t"), col("event_type")))
      .withColumn("m", map_concat(col("m1"), col("m2")))
    ev.select(col("event_id"),
        element_at(col("m"), "k").cast("bigint").as("k_val"),
        element_at(col("m"), "t").as("t_val"),
        size(col("m")).cast("bigint").as("n_entries"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys"))
      .orderBy("event_id")
  }

  /** Real JSON parsing (get_json_object vs DuckDB's JSON extension) —
    * the q_events_props regex variant exists for regex coverage; this
    * one runs both engines' actual JSON parsers over the props column.
    */
  private val qJsonFuncs = QueryDef.sqlChecked("q_json_funcs")(
    "SELECT event_id, cast(json_extract_string(props, '$.k') as bigint) AS k, " +
      "json_valid(props) AS is_valid FROM events ORDER BY event_id"
  ) { (s, d) =>
    Tables.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"),
        get_json_object(col("props"), "$").isNotNull.as("is_valid"))
      .orderBy("event_id")
  }

  val defs: Seq[QueryDef] = Seq(qString, qPromo, qDate, qArray, qMath,
    qSalted, qZorder, qMapFuncs, qJsonFuncs)
}
