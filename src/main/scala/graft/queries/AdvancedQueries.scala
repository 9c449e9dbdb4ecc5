package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Advanced relational coverage: as-of join, sessionization, CUBE,
  * the wider window-function surface, and HLL approximate distinct.
  */
object AdvancedQueries {

  /** As-of join: each purchase gets the user's most recent prior (or
    * simultaneous) click. Clicks deduped to one per (user, ts) first
    * so tie-breaks are engine-independent.
    */
  private val qAsof = QueryDef.sqlChecked("q_asof_join")(
    "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), " +
      "c AS (SELECT * FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY user_id, ts ORDER BY event_id) AS rn FROM events " +
      "WHERE event_type = 'click') WHERE rn = 1) " +
      "SELECT p.event_id, p.user_id, epoch_us(p.ts) AS pts, " +
      "c.event_id AS click_id, epoch_us(c.ts) AS cts " +
      "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts " +
      "ORDER BY p.event_id"
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wDedup = Window.partitionBy("user_id", "ts").orderBy("event_id")
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin(purchases, clicks, Seq("user_id"), "ts",
      carry = Seq("event_id", "ts"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("pts"),
        col("asof_event_id").as("click_id"),
        unix_micros(col("asof_ts")).as("cts"))
      .orderBy("event_id")
  }

  /** Sessionization: 30-minute inactivity gap splits sessions. */
  private val qSessionize = QueryDef.sqlChecked("q_sessionize")(
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), " +
      "m AS (SELECT user_id, event_id, us, CASE WHEN lag(us) OVER " +
      "(PARTITION BY user_id ORDER BY us, event_id) IS NULL OR " +
      "us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 " +
      "THEN 1 ELSE 0 END AS is_new FROM e), " +
      "s AS (SELECT user_id, us, cast(sum(is_new) OVER (PARTITION BY user_id " +
      "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) as bigint) AS session_id FROM m) " +
      "SELECT user_id, session_id, count(*) AS n_events, " +
      "min(us) AS start_us, max(us) AS end_us " +
      "FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val m = e.withColumn("is_new",
      when(lag("us", 1).over(w).isNull ||
        col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
    val sess = m.withColumn("session_id",
      sum("is_new").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("bigint"))
    sess.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"))
      .orderBy("user_id", "session_id")
  }

  /** CUBE over two dimensions with coalesced totals. */
  private val qCube = QueryDef.sqlChecked("q_cube")(
    "SELECT coalesce(l_returnflag, 'ALL') AS rf, " +
      "coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n, " +
      s"${graft.Exact.sqlDsum("l_extendedprice", 2)} AS sum_price " +
      "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
      "ORDER BY rf, ls"
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        graft.Exact.dsum(col("l_extendedprice"), 2).as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_price"))
      .orderBy("rf", "ls")
  }

  /** Wider window surface: rank, dense_rank, ntile, lead, sliding
    * 4-row average — one pass, one window partition spec family.
    */
  private val qWindowAnalytics = QueryDef.sqlChecked("q_window_analytics")(
    "SELECT o_custkey, o_orderkey, " +
      "cast(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) as bigint) AS rnk, " +
      "cast(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) as bigint) AS drnk, " +
      "cast(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) as bigint) AS quartile, " +
      "lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order, " +
      "cast(sum(cast(o_totalprice as decimal(18,2))) OVER (PARTITION BY o_custkey " +
      "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) as double) / " +
      "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sliding_avg " +
      "FROM orders ORDER BY o_custkey, o_orderkey"
  ) { (s, d) =>
    val byPrio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byDate = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val slide = byDate.rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(byPrio).cast("bigint").as("rnk"),
      dense_rank().over(byPrio).cast("bigint").as("drnk"),
      ntile(4).over(byPrice).cast("bigint").as("quartile"),
      lead("o_orderkey", 1).over(byDate).as("next_order"),
      (sum(col("o_totalprice").cast("decimal(18,2)")).over(slide)
        .cast("double") / count(lit(1)).over(slide)).as("sliding_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** HLL approximate distinct, gate-visible ERROR BOUND: the estimate
    * is algorithm-specific (not SQL-expressible in DuckDB), so per
    * group the query emits the exact distinct count (hash-checked
    * exactly) plus a within-5% flag comparing HLL to exact — an HLL
    * regression flips the flag and the oracle mismatches. HLL++ here
    * is deterministic (fixed hash, no RNG), so the flag is stable;
    * rsd=0.02 keeps measured max error ≤ 0.9% across the sf dirs —
    * ~6× margin under the bound.
    */
  private val qApproxDistinct = QueryDef.sqlChecked("q_approx_distinct")(
    "SELECT o_orderpriority, " +
      "cast(count(DISTINCT o_custkey) as bigint) AS exact_cust, " +
      "cast(1 as bigint) AS within_5pct " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
        countDistinct(col("o_custkey")).as("exact_cust"))
      .select(col("o_orderpriority"), col("exact_cust"),
        when(abs(col("approx_cust") - col("exact_cust")).cast("double")
          <= col("exact_cust").cast("double") * 0.05, 1L).otherwise(0L)
          .as("within_5pct"))
      .orderBy("o_orderpriority")
  }

  /** Runtime-filter (bloom) join pruning — THE 100 TB fact-scan join
    * optimization: build a bloom filter over the small side's keys
    * (urgent orders), pre-filter the big fact scan with
    * might_contain BEFORE the shuffle, then run the exact join on the
    * survivors. Uses Spark's own BloomFilterAggregate /
    * BloomFilterMightContain (what InjectRuntimeFilter plans) via the
    * shim, with the built filter inlined as a literal — the explicit,
    * always-on form of the optimizer's conditional rewrite. Gate in
    * the q_approx_distinct pattern: `n_exact` and `n_pruned` (rows the
    * filter removed must be ≥ 0 non-matching rows; emitted exactly),
    * plus flags — `no_false_negatives` (bloom-prefiltered exact join ≡
    * plain semi-join; bloom misses nothing by construction) and
    * `fp_ok` (false-positive pass-through ≤ 5% of non-matching rows at
    * 10 bits/key). A bloom/hash regression flips a flag and the
    * oracle mismatches.
    */
  private val qBloomJoin = QueryDef.sqlChecked("q_bloom_join")(
    "WITH urgent AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'), " +
      "ex AS (SELECT count(*) AS n_exact FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM urgent)), " +
      "tot AS (SELECT count(*) AS n_total FROM lineitem) " +
      "SELECT n_exact, cast(1 as bigint) AS no_false_negatives, " +
      "cast(1 as bigint) AS fp_ok FROM ex, tot"
  ) { (s, d) =>
    import s.implicits._
    val shims = org.apache.spark.sql.graftshim.Shims
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey")).distinct()
    val lineitem = Tables.lineitem(s, d)
    val nKeys = urgent.count()
    val bloom = urgent
      .agg(shims.bloomAgg(col("o_orderkey"), nKeys, nKeys * 10).as("bf"))
      .head().getAs[Array[Byte]](0)
    // a left join against the DISTINCT urgent keys preserves lineitem
    // row multiplicity, so (total, matched) pairs read in ONE pass
    // per scan: (nPass, nFinal) over the bloom-filtered scan and
    // (nTotal, nExact) over the plain scan — 2 fact scans / 2
    // actions where the count-per-question form paid 4 scans / 4
    // actions for the same four scalars
    val marked = urgent
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .withColumn("__m", lit(1))
    val passedRow = lineitem
      .filter(shims.bloomMightContain(bloom, col("l_orderkey")))
      .join(marked, Seq("l_orderkey"), "left")
      .agg(count(lit(1)), count(col("__m"))).head()
    val (nPass, nFinal) = (passedRow.getLong(0), passedRow.getLong(1))
    val exactRow = lineitem
      .join(marked, Seq("l_orderkey"), "left")
      .agg(count(lit(1)), count(col("__m"))).head()
    val (nTotal, nExact) = (exactRow.getLong(0), exactRow.getLong(1))
    val fpOk = nPass - nExact <= math.max(1L, (nTotal - nExact) / 20)
    Seq((nExact, if (nFinal == nExact) 1L else 0L, if (fpOk) 1L else 0L))
      .toDF("n_exact", "no_false_negatives", "fp_ok")
  }

  /** GK-sketch approximate percentiles, gate-visible RANK BOUND (the
    * q_approx_distinct pattern): the oracle hash-checks the exact
    * rank-based p50/p90 plus constant within-bound flags; the Spark
    * side computes the actual rank of each percentile_approx value
    * and flags |rank − q·n| ≤ 2·n/accuracy + 1 — twice the GK
    * guarantee (ε = 1/accuracy), so the flag only flips on a sketch
    * regression. At 100 TB this is THE percentile you run: the GK
    * summary is a bounded-size mergeable state per group, no global
    * sort (the exact rank form exists as q_percentiles_exact).
    */
  private val qApproxQuantile = {
    val acc = 1000
    QueryDef.sqlChecked("q_approx_quantile")(
      "WITH r AS (SELECT o_orderpriority, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn, " +
        "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) " +
        "SELECT o_orderpriority, " +
        "max(CASE WHEN rn = cast(ceil(0.50 * n) as bigint) THEN o_totalprice END) AS p50, " +
        "max(CASE WHEN rn = cast(ceil(0.90 * n) as bigint) THEN o_totalprice END) AS p90, " +
        "cast(1 as bigint) AS ok50, cast(1 as bigint) AS ok90 " +
        "FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
      val w = Window.partitionBy("o_orderpriority")
      val r = orders.select(col("o_orderpriority"), col("o_totalprice"),
        row_number().over(w.orderBy("o_totalprice", "o_orderkey")).as("rn"),
        count(lit(1)).over(w).as("n"))
      def pick(q: Double) =
        max(when(col("rn") === ceil(lit(q) * col("n")).cast("bigint"),
          col("o_totalprice")))
      val exact = r.groupBy("o_orderpriority")
        .agg(pick(0.50).as("p50"), pick(0.90).as("p90"), max("n").as("n"))
      val ap = orders.groupBy("o_orderpriority").agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(acc)).as("a50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(acc)).as("a90"))
      val ranks = orders.join(broadcast(ap), "o_orderpriority")
        .groupBy("o_orderpriority").agg(
          sum(when(col("o_totalprice") <= col("a50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("o_totalprice") <= col("a90"), 1L).otherwise(0L)).as("r90"))
      def ok(rank: String, q: Double) =
        when(abs(col(rank).cast("double") - lit(q) * col("n").cast("double"))
          <= col("n").cast("double") * (2.0 / acc) + 1.0, 1L).otherwise(0L)
      exact.join(ranks, "o_orderpriority")
        .select(col("o_orderpriority"), col("p50"), col("p90"),
          ok("r50", 0.5).as("ok50"), ok("r90", 0.9).as("ok90"))
        .orderBy("o_orderpriority")
    }
  }

  /** Statistical aggregates from exact decimal power sums — stddev
    * and correlation computed with deterministic double ops on exact
    * sums, so they hash-match (built-in stddev/corr accumulate
    * doubles order-dependently and would drift).
    */
  private val qStats = QueryDef.sqlChecked("q_stats_exact")(
    "SELECT l_returnflag, n, " +
      "CASE WHEN n <= 1 THEN NULL ELSE " +
      "sqrt((sxx - sx * sx / n) / (n - 1)) END AS stddev_qty, " +
      // corr is rounded to 12 digits: its wide decimal(28,4) inputs
      // exceed 2^53 when scaled, and DuckDB's decimal->double cast
      // double-rounds there (int128/10^s) while Java's is correctly
      // rounded - a last-ulp input wobble the rounding absorbs.
      // n<=1 / zero-variance groups are NULL in BOTH engines (unguarded,
      // Spark /0 -> NULL but DuckDB -> NaN/inf)
      "CASE WHEN n <= 1 OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL ELSE " +
      "round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 12) END AS corr_qty_price " +
      "FROM (SELECT l_returnflag, cast(count(*) as double) AS n, " +
      s"${graft.Exact.sqlDsum("l_quantity", 2)} AS sx, " +
      s"${graft.Exact.sqlDsum("l_quantity*l_quantity", 4)} AS sxx, " +
      s"${graft.Exact.sqlDsumWide("l_extendedprice", 2)} AS sy, " +
      s"${graft.Exact.sqlDsumWide("l_extendedprice*l_extendedprice", 4)} AS syy, " +
      s"${graft.Exact.sqlDsumWide("l_quantity*l_extendedprice", 4)} AS sxy " +
      "FROM lineitem GROUP BY l_returnflag) ORDER BY l_returnflag"
  ) { (s, d) =>
    import graft.Exact._
    val base = Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      dsum(col("l_quantity"), 2).as("sx"),
      dsum(col("l_quantity") * col("l_quantity"), 4).as("sxx"),
      dsumWide(col("l_extendedprice"), 2).as("sy"),
      dsumWide(col("l_extendedprice") * col("l_extendedprice"), 4).as("syy"),
      dsumWide(col("l_quantity") * col("l_extendedprice"), 4).as("sxy"))
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    base.select(col("l_returnflag"), col("n"),
      when(col("n") <= 1, lit(null).cast("double")).otherwise(
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
        .as("stddev_qty"),
      when(col("n") <= 1 || varX === 0 || varY === 0,
        lit(null).cast("double")).otherwise(
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt(varX * varY), 12))
        .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** MERGEABLE distinct-count sketches — the re-aggregation story
    * behind every 100 TB incremental rollup: per-group HLL sketches
    * (DataSketches, binary-mergeable) are built ONCE, then the global
    * distinct estimate comes from `hll_union_agg` over the five group
    * sketches — the raw data is touched once, and the union would
    * work the same over sketches persisted per partition/day (the
    * incremental-MV form of q_approx_distinct). Groups OVERLAP in
    * customers, so the union is a genuine set union, not a sum.
    * Gate in the q_approx_distinct pattern: exact values hash-checked,
    * sketch estimate asserted within 5% (deterministic: fixed
    * lgConfigK, hashing without RNG, register-max merge is
    * order-independent).
    */
  private val qHllUnion = QueryDef.sqlChecked("q_hll_union")(
    "SELECT cast(count(distinct o_custkey) as bigint) AS exact_total, " +
      "cast(count(distinct o_orderpriority) as bigint) AS n_groups, " +
      "cast(1 as bigint) AS union_within_5pct FROM orders"
  ) { (s, d) =>
    val perGroup = Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey"), 14).as("sk"))
    val exact = Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey")).as("exact_total"))
    perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
        count(lit(1)).as("n_groups"))
      .crossJoin(broadcast(exact))
      .select(col("exact_total"), col("n_groups"),
        when(abs(col("est") - col("exact_total")).cast("double")
          <= col("exact_total").cast("double") * 0.05, 1L).otherwise(0L)
          .as("union_within_5pct"))
  }

  /** Count-min-sketch heavy hitters over the document vocabulary —
    * the streaming-friendly frequency sketch (fixed memory, mergeable
    * counters) next to `p_topk_tokens`' exact heap. The exact top-20
    * counts are hash-checked; per token a flag asserts the CMS
    * estimate respects its guarantee (overestimate only, excess
    * ≤ eps × total token count). Deterministic: fixed seed, counter
    * adds commute across partitions.
    */
  private val qCmsTopk = QueryDef.sqlChecked("q_cms_topk")(
    s"SELECT t, cnt, cast(1 as bigint) AS cms_ok FROM (" +
      s"SELECT t, count(*) AS cnt FROM (" +
      s"SELECT unnest(${graft.functions.text.sql.tokensOf("text")}) AS t " +
      // hash tie-break at the boundary, as p_topk_tokens — selection
      // must not hang on either engine's string collation
      "FROM documents) GROUP BY t ORDER BY cnt DESC, " +
      s"${graft.functions.text.sql.polyHash("t")}, t LIMIT 20)"
  ) { (s, d) =>
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(graft.functions.text.tokens(col("text"))).as("t"))
    val total = toks.count()
    val eps = 0.0005
    val cms = toks.stat.countMinSketch("t", eps, 0.99, 42)
    val top = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), graft.functions.text.polyHash(col("t")),
        col("t")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top.map { case (t, cnt) =>
      val est = cms.estimateCount(t)
      (t, cnt, if (est >= cnt && est - cnt <= eps * total) 1L else 0L)
    }.toSeq.toDF("t", "cnt", "cms_ok")
  }

  val defs: Seq[QueryDef] = Seq(qAsof, qSessionize, qCube,
    qWindowAnalytics, qApproxDistinct, qBloomJoin, qApproxQuantile,
    qStats, qHllUnion, qCmsTopk)
}
