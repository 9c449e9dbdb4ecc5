package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("z-ordered files are localized on both dimensions") {
    val path = Files.createTempDirectory("graft-z").toString + "/orders_z"
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("bigint").as("days"))
    Layout.writeZOrdered(ord, path, "o_custkey", "days", numFiles = 8)

    val out = spark.read.parquet(path)
      .withColumn("f", input_file_name())
    def avgSpan(c: String): (Double, Double) = {
      val spans = out.groupBy("f")
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .agg(avg("span")).first().getDouble(0)
      val global = out.agg((max(col(c)) - min(col(c))).cast("double"))
        .first().getDouble(0)
      (spans, global)
    }
    val (custSpan, custGlobal) = avgSpan("o_custkey")
    val (daySpan, dayGlobal) = avgSpan("days")
    // each file covers a fraction of BOTH dimensions — that's the
    // property a single-column sort can't give
    assert(custSpan < custGlobal * 0.8,
      s"custkey span $custSpan vs global $custGlobal")
    assert(daySpan < dayGlobal * 0.8,
      s"days span $daySpan vs global $dayGlobal")
    assert(out.count() == ord.count())
  }

  test("z-order normalization survives microsecond-epoch ranges") {
    // value range ~3e13 us (a year of microsecond timestamps): the old
    // Long math overflowed at (c-lo)*65535 and produced negative
    // z-values / a degenerate layout
    val base = 1700000000000000L
    val year = 31557600000000L
    val path = Files.createTempDirectory("graft-zwide").toString + "/wide_z"
    val df = (0 until 2048).map { i =>
      (i.toLong, base + (i.toLong * 15411914062L) % year,
        (i.toLong * 7919L) % 100000L)
    }.toDF("id", "us", "v")
    Layout.writeZOrdered(df, path, "us", "v", numFiles = 4)
    val out = spark.read.parquet(path).withColumn("f", input_file_name())
    assert(out.count() == 2048)
    // localized on the wide dimension too — overflow would leave one
    // of the dimensions unpartitioned
    val span = out.groupBy("f")
      .agg((max(col("us")) - min(col("us"))).cast("double").as("s"))
      .agg(avg("s")).first().getDouble(0)
    val global = out.agg((max(col("us")) - min(col("us"))).cast("double"))
      .first().getDouble(0)
    assert(span < global * 0.8, s"us span $span vs global $global")
  }

  test("z-value is a bijective interleave on 16-bit inputs") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L)).toDF("a", "b")
    val got = df.select(Layout.zValue(col("a"), col("b"))).as[Long].collect()
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(j => (((a >> j) & 1L) << (2 * j)) |
        (((b >> j) & 1L) << (2 * j + 1))).reduce(_ | _)
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L)).map { case (a, b) => ref(a, b) }
    assert(got.toSeq == want)
  }
}
