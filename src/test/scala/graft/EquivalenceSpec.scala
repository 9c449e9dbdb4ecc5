package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

/** Randomized equivalence: the scalable operator implementations must
  * agree with brute-force reference implementations on seeded random
  * data (including adversarial duplicates/ties).
  */
class EquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  test("AsOfJoin equals the naive greatest-right-ts-per-left join") {
    // small key space + coarse ts → plenty of collisions and ties
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(50).toLong))
      .toDF("k", "lid", "ts")
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(10).toLong, (1000 + i).toLong, rnd.nextInt(50).toLong))
      .toDF("k", "rid", "ts")
    // dedupe right per (k, ts) with max rid — the same tiebreak the
    // operator's carry-column ordering produces
    val r1 = right.groupBy("k", "ts").agg(max("rid").as("rid"))

    val got = AsOfJoin(left, r1, Seq("k"), "ts", carry = Seq("rid"))
      .select(col("lid"), col("asof_rid"))
      .as[(Long, Option[Long])].collect().toMap

    val naive = left.as("l")
      .join(r1.as("r"), col("l.k") === col("r.k") &&
        col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.lid"))
      .agg(max(struct(col("r.ts"), col("r.rid"))).as("best"))
      .select(col("lid"), col("best.rid"))
      .as[(Long, Option[Long])].collect().toMap

    assert(got == naive)
  }

  test("binned RangeJoin equals the naive theta join") {
    val points = Seq.fill(500)(rnd.nextInt(10000).toLong).toDF("p")
    val intervals = Seq.tabulate(50) { i =>
      val lo = rnd.nextInt(9500).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(800).toLong)
    }.toDF("iv", "lo", "hi")

    val got = RangeJoin.binned(points, intervals, "p", "lo", "hi", 256)
      .groupBy("iv").count().as[(Long, Long)].collect().toMap
    val naive = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .groupBy("iv").count().as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("binned RangeJoin handles degenerate one-unit intervals") {
    val points = Seq(0L, 255L, 256L, 257L, 9999L).toDF("p")
    val intervals = Seq((1L, 256L, 257L), (2L, 0L, 1L)).toDF("iv", "lo", "hi")
    val got = RangeJoin.binned(points, intervals, "p", "lo", "hi", 256)
      .select("p", "iv").as[(Long, Long)].collect().toSet
    assert(got == Set((256L, 1L), (0L, 2L)))
  }
}
