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

  test("compaction collapses small files, preserves data, swaps in place") {
    val path = Files.createTempDirectory("graft-compact").toString + "/t"
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    // simulate an append-heavy table: many tiny files
    ord.repartition(40).write.mode("overwrite").parquet(path)
    def parquetFiles() = java.nio.file.Files.list(
      java.nio.file.Paths.get(path)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(parquetFiles() == 40)
    val before = ord.count()
    val sumBefore = spark.read.parquet(path)
      .agg(sum(col("o_orderkey"))).head().getLong(0)
    val files = Layout.compact(spark, path, targetRowsPerFile = 200)
    assert(parquetFiles() == files && files < 40,
      s"expected $files compacted files, found ${parquetFiles()}")
    val after = spark.read.parquet(path)
    assert(after.count() == before)
    assert(after.agg(sum(col("o_orderkey"))).head().getLong(0) == sumBefore)
  }

  test("schema evolution: mergeSchema reads old and new files together") {
    val path = Files.createTempDirectory("graft-evolve").toString + "/t"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    v1.write.mode("overwrite").parquet(path)
    // a later writer adds a column — the 100 TB reality of long-lived
    // tables; readers must see old rows with the new column as null
    val v2 = Seq((3L, "c", 9.5)).toDF("id", "name", "score")
    v2.write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("id", "name", "score"))
    assert(merged.count() == 3)
    assert(merged.filter(col("score").isNull).count() == 2)
    assert(merged.filter(col("id") === 3L).select("score")
      .head().getDouble(0) == 9.5)
  }
}
