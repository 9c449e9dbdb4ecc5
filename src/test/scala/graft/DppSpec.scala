package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dynamic partition pruning over a date-partitioned fact table — at
  * 100 TB the fact is partitioned by day/month and most queries join
  * it to a filtered dimension; DPP turns the dim filter into a runtime
  * partition filter on the fact scan, so only the selected partitions
  * are read at all.
  */
class DppSpec extends SparkTestBase {
  import spark.implicits._

  test("dim filter becomes a runtime partition filter on the fact scan") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val years = fact.select("o_year").distinct().as[Int].collect().sorted
    assert(years.length >= 3, s"need several year partitions, got ${years.toSeq}")

    // the dim must be a real relation (DPP's benefit heuristic skips
    // driver-local tables) — write and re-read it
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    years.map(y => (y, if (y == years.head) "keep" else "drop"))
      .toSeq.toDF("y", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(broadcast(dim.filter(col("tag") === "keep")),
      col("o_year") === col("y"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")

    // pruned result ≡ direct partition filter
    val expected = fact.filter(col("o_year") === years.head).count()
    assert(joined.count() == expected)
  }
}
