package graft

import graft.operators.BudgetSample
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BudgetSample: the scalable (histogram + one-straddling-bucket
  * window) selection must be row-for-row the naive greedy window on
  * every shape that can break the decomposition — boundary ties at
  * exactly the budget, zero-weight rows AT the boundary, parts that
  * fit entirely, parts whose first bucket already overflows — and its
  * exact-window input must be confined to at most one bucket per part.
  */
class BudgetSampleSpec extends SparkTestBase {

  private def df(rows: Seq[(String, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("part", "pr", "key", "w")
  }

  private def asSet(d: DataFrame): Set[(String, Long, Long, Long)] =
    d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  private def check(rows: Seq[(String, Long, Long, Long)], budget: Long): Unit = {
    val in = df(rows)
    val naive = asSet(BudgetSample.naive(in, budget)
      .select("part", "pr", "key", "w"))
    val scal = asSet(BudgetSample.scalable(in, budget)
      .select("part", "pr", "key", "w"))
    assert(scal == naive,
      s"scalable != naive at budget $budget: " +
        s"only-scalable=${scal -- naive}, only-naive=${naive -- scal}")
  }

  test("boundary tie: prefix + bucket sum == budget routes to the window") {
    // bucket 0 sums to exactly the budget — a "keep whole bucket"
    // classification would wrongly keep a zero-weight row whose
    // cum-before equals the budget
    val rows = Seq(
      ("a", 0L, 1L, 300L), ("a", 0L, 2L, 500L), ("a", 0L, 3L, 0L),
      ("a", 1L, 4L, 100L))
    check(rows, 800L)
    // the zero-weight row's predecessors sum to 800 == budget → dropped
    val kept = asSet(BudgetSample.scalable(df(rows), 800L))
    assert(!kept.exists(_._3 == 3L), "zero-weight row at the boundary must drop")
    assert(!kept.exists(_._3 == 4L), "post-budget bucket must drop")
    assert(kept.map(_._3) == Set(1L, 2L))
  }

  test("zero-weight rows BELOW the boundary are kept") {
    val rows = Seq(
      ("a", 0L, 1L, 0L), ("a", 0L, 2L, 0L), ("a", 1L, 3L, 799L),
      ("a", 2L, 4L, 5L), ("a", 3L, 5L, 1L))
    check(rows, 800L)
    val kept = asSet(BudgetSample.scalable(df(rows), 800L)).map(_._3)
    // cum-befores: 0,0,0,799,804 → keep 1,2,3,4 (4 straddles), drop 5
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("first bucket already past budget; fits-entirely part; straddle mid-bucket") {
    val rows = Seq(
      // part b: first bucket overflows alone → only its prefix survives
      ("b", 0L, 10L, 600L), ("b", 0L, 11L, 600L), ("b", 1L, 12L, 1L),
      // part c: total 700 < 800 → everything kept
      ("c", 0L, 20L, 300L), ("c", 5L, 21L, 400L),
      // part d: straddle in bucket 2 with in-bucket key order deciding
      ("d", 1L, 30L, 500L), ("d", 2L, 31L, 200L), ("d", 2L, 32L, 200L),
      ("d", 2L, 33L, 200L), ("d", 9L, 34L, 50L))
    check(rows, 800L)
    val kept = asSet(BudgetSample.scalable(df(rows), 800L)).map(_._3)
    assert(kept == Set(10L, 11L, 20L, 21L, 30L, 31L, 32L))
  }

  test("exact-window input is at most one straddling bucket per part") {
    val rows = (0 until 200).map { i =>
      ("p" + (i % 4), (i / 4).toLong % 50L, i.toLong, 37L)
    }
    val in = df(rows)
    val cls = BudgetSample.classify(in, 800L)
    val edgeBuckets = cls.filter(col("cls") === "edge")
      .groupBy("part").agg(count(lit(1)).as("n")).collect()
    assert(edgeBuckets.forall(_.getLong(1) <= 1L),
      "more than one straddling bucket in a part — the histogram prefix is wrong")
    val edgeRows = BudgetSample.edgeRows(in, cls)
    val maxBucket = in.groupBy("part", "pr").count()
      .agg(max("count")).head().getLong(0)
    assert(edgeRows.count() <= 4 * maxBucket,
      "window input exceeds one bucket per part — not the 1/buckets scale shape")
    check(rows, 800L)
  }

  test("per-part budgets: scalableB == naiveB, parts without a budget row select nothing") {
    import spark.implicits._
    val rows = Seq(
      ("a", 0L, 1L, 300L), ("a", 0L, 2L, 500L), ("a", 1L, 3L, 100L),
      ("b", 0L, 10L, 50L), ("b", 2L, 11L, 50L), ("b", 3L, 12L, 50L),
      ("c", 0L, 20L, 10L))
    val in = df(rows)
    val budgets = Seq(("a", 800L), ("b", 120L)).toDF("part", "budget")
    val naive = asSet(BudgetSample.naiveB(in, budgets))
    val scal = asSet(BudgetSample.scalableB(in, budgets))
    assert(scal == naive)
    assert(!scal.exists(_._1 == "c"), "part without a budget row must select nothing")
    assert(scal.map(_._3) == Set(1L, 2L, 10L, 11L, 12L),
      "a: 300+500 straddles 800; b: 50+50 under 120, third straddles")
  }

  test("random fuzz across budgets") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      ("p" + rnd.nextInt(3), rnd.nextInt(10).toLong, i.toLong,
        rnd.nextInt(5).toLong) // frequent zero weights and bucket ties
    }
    for (budget <- Seq(1L, 7L, 50L, 100L, 1000L)) check(rows, budget)
  }
}
