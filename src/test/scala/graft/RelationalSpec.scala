package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  test("all registered queries run non-empty at sf0.001") {
    SparkEntry.all.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"query ${q.name} returned no rows")
    }
  }

  test("every oracle name is also a query name") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("query names are unique across modules") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("q1 aggregates match a direct computation") {
    val got = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .agg(sum("count_order")).first().getLong(0)
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(got == want)
  }

  test("window rank never exceeds 3 per customer") {
    val df = SparkEntry.queries("q_window_rank")(spark, sf)
    assert(df.groupBy("o_custkey").count()
      .filter(col("count") > 3).count() == 0)
  }

  test("intersect/except partition the 1996 customer set") {
    val inter = SparkEntry.queries("q_intersect")(spark, sf).count()
    val except = SparkEntry.queries("q_except")(spark, sf).count()
    val y96 = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_custkey").distinct().count()
    assert(inter + except == y96)
  }

  test("q21 plans the semi AND anti self-probes as hash joins, " +
    "no cartesian product") {
    val df = SparkEntry.queries("q21_waiting_suppliers")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS probe must plan as a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS probe must plan as an anti join")
    assert(!plan.contains("Cartesian"),
      "the supplier inequality must ride the equi-join as a filter")
  }
}
