package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.functions._

/** `IvfIndex.probeExpr` — the distributed batch probe — must produce
  * EXACTLY `Model.topLeaves` per query row, through both branches:
  * the flat top-n expression and the two-level routed expression.
  */
class RoutedProbeSpec extends SparkTestBase {
  import spark.implicits._

  import PlantedVectors.planted

  private def check(model: IvfIndex.Model, nProbe: Int,
      queries: Seq[Array[Double]]): Unit = {
    val got = queries.map(_.toSeq).toDF("qv")
      .withColumn("probe", IvfIndex.probeExpr(model, col("qv"), nProbe))
      .select("probe").as[Seq[Int]].collect()
    queries.zip(got).foreach { case (q, p) =>
      assert(p == model.topLeaves(q, nProbe),
        s"probeExpr ${p} != topLeaves ${model.topLeaves(q, nProbe)}")
    }
  }

  test("routed expression == Model.topLeaves, row for row") {
    val (centers, cents) = planted(40, 52, 12, 17L) // 2080 leaves
    val router = IvfIndex.Router.build(cents)
    val model = IvfIndex.Model(cents, router = Some(router))
    assert(model.routed(router, 4), "router must engage for this test")
    val rnd = new scala.util.Random(23)
    val queries = Seq.fill(40) {
      val c = centers(rnd.nextInt(40))
      Array.tabulate(12)(j => c(j) + rnd.nextGaussian())
    } ++ Seq.fill(10)(Array.fill(12)(rnd.nextGaussian() * 10.0))
    check(model, 4, queries)
    check(model, 9, queries) // non-default target, odd take
  }

  test("flat expression == Model.topLeaves (no router)") {
    val (_, cents) = planted(6, 8, 12, 29L) // 48 leaves, flat
    val model = IvfIndex.Model(cents)
    val rnd = new scala.util.Random(31)
    val queries = Seq.fill(25)(Array.fill(12)(rnd.nextGaussian() * 5.0))
    check(model, 3, queries)
    // nProbe past the leaf count: both sides return all leaves ranked
    check(model, 60, queries.take(5))
  }

  test("NaN query rows: driver and executor paths agree (skip-NaN rule)") {
    // one convention everywhere: NaN-scored leaves are skipped, NaN
    // super scores rank last, an all-NaN query probes NOTHING — and
    // probeExpr stays row-for-row equal to topLeaves through both the
    // routed and the flat branch even on such rows
    val rnd = new scala.util.Random(47)
    def mixed(dim: Int): Seq[Array[Double]] = Seq(
      Array.fill(dim)(Double.NaN), // all-NaN
      Array.tabulate(dim)(j => if (j == 0) Double.NaN
        else rnd.nextGaussian()), // partly-NaN
      Array.fill(dim)(rnd.nextGaussian())) // finite control

    val (_, flatCents) = planted(6, 8, 12, 29L)
    val flat = IvfIndex.Model(flatCents)
    check(flat, 3, mixed(12))
    assert(flat.topLeaves(Array.fill(12)(Double.NaN), 3).isEmpty,
      "an all-NaN query must probe nothing")

    val (_, cents) = planted(40, 52, 12, 17L)
    val router = IvfIndex.Router.build(cents)
    val routed = IvfIndex.Model(cents, router = Some(router))
    assert(routed.routed(router, 4))
    check(routed, 4, mixed(12))
    assert(routed.topLeaves(Array.fill(12)(Double.NaN), 4).isEmpty,
      "an all-NaN query must probe nothing (routed)")
  }

  test("f32 routing expression: parity >= 0.99 with the double router, " +
      "exact fallback when the router doesn't engage") {
    val (centers, cents) = planted(40, 52, 12, 17L) // 2080 leaves
    val router = IvfIndex.Router.build(cents)
    val model = IvfIndex.Model(cents, router = Some(router))
    assert(model.routed(router, 4))
    val rnd = new scala.util.Random(53)
    val queries = Seq.fill(60) {
      val c = centers(rnd.nextInt(40))
      Array.tabulate(12)(j => c(j) + rnd.nextGaussian())
    } ++ Seq.fill(15)(Array.fill(12)(rnd.nextGaussian() * 10.0))
    val df = queries.map(_.toSeq).toDF("qv")
      .withColumn("a", IvfIndex.probeExpr(model, col("qv"), 4))
      .withColumn("b", IvfIndex.probeExprF32(model, col("qv"), 4))
    val (hit, n) = df
      .selectExpr("size(array_intersect(a, b)) as hit", "size(a) as n")
      .agg(sum(col("hit")), sum(col("n"))).head() match {
        case r => (r.getLong(0), r.getLong(1))
      }
    assert(n == 4L * queries.length)
    val parity = hit.toDouble / n
    assert(parity >= 0.99, s"f32 routing parity $parity < 0.99")

    // non-engaging router: probeExprF32 must dispatch to the EXACT
    // flat expression — bit-identical lists, not just parity
    val (_, smallCents) = planted(4, 8, 12, 37L)
    val smallRouter = IvfIndex.Router(Array(smallCents(0), smallCents(1)),
      Array.tabulate(32)(_ % 2))
    val small = IvfIndex.Model(smallCents, router = Some(smallRouter))
    assert(!small.routed(smallRouter, 4))
    val exact = queries.take(10).map(_.toSeq).toDF("qv")
      .withColumn("a", IvfIndex.probeExpr(small, col("qv"), 4))
      .withColumn("b", IvfIndex.probeExprF32(small, col("qv"), 4))
      .selectExpr("a = b as same").as[Boolean].collect()
    assert(exact.forall(identity),
      "fallback branch must be the exact flat expression")
  }

  test("a non-engaging router falls back to the flat expression") {
    val (_, cents) = planted(4, 8, 12, 37L) // 32 leaves < target
    val router = IvfIndex.Router(Array(cents(0), cents(1)),
      Array.tabulate(32)(_ % 2))
    val model = IvfIndex.Model(cents, router = Some(router))
    assert(!model.routed(router, 4))
    val rnd = new scala.util.Random(41)
    check(model, 4, Seq.fill(10)(Array.fill(12)(rnd.nextGaussian()))
      .map(identity))
  }
}
