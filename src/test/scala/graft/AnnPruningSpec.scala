package graft

import graft.operators.IvfIndex
import graft.plans.{AnnPruning, GraftExtensions, IndexCatalog}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** SURVEY §4-3: the SQL-transparent ANN probe. `graft_ann_probe` must
  * (1) vanish from the physical plan, replaced by a `leaf_id IN`
  * filter, (2) become a PARTITION filter on a partitionBy(leaf_id)
  * index — unprobed leaves never read — and (3) return exactly the
  * probed leaves' rows. An unregistered index name must fail loudly,
  * never fall back to a full scan.
  */
class AnnPruningSpec extends SparkTestBase {

  private lazy val setup = {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding", 8)
    val path = java.nio.file.Files
      .createTempDirectory("graft_annsql").toString + "/idx"
    IvfIndex.write(indexed, path)
    IndexCatalog.register("spec_idx", model)
    (path, model)
  }

  // integer-valued query vector: exact in SQL text round-trip
  private val q = (0 until 64).map(i => (i % 7).toDouble)

  test("graft_ann_probe rewrites to a partition-pruning leaf_id IN") {
    val (path, model) = setup
    spark.read.parquet(path).createOrReplaceTempView("ann_idx")
    val lit = q.map(v => s"cast(${v.toInt} as double)").mkString(",")
    val df = spark.sql("SELECT vec_id, leaf_id FROM ann_idx " +
      s"WHERE graft_ann_probe('spec_idx', leaf_id, array($lit), 3)")

    // the marker predicate never reaches execution
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("graft_ann_probe"), planStr)

    // the In-list is a PARTITION filter on the scan, not a data filter
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("leaf_id")),
      s"no partition filter on leaf_id: ${scan.partitionFilters}")

    // result = exactly the probed leaves' rows
    val leaves = model.topLeaves(q.toArray, 3)
    val expect = spark.read.parquet(path)
      .filter(col("leaf_id").isin(leaves: _*))
      .select("vec_id", "leaf_id").collect().toSet
    assert(df.collect().toSet == expect)

    // and it actually pruned: probed leaves < total leaves
    assert(leaves.size < model.centroids.length)
  }

  test("Column-API probe takes the same rewrite path") {
    val (path, model) = setup
    val df = spark.read.parquet(path)
      .filter(AnnPruning.probe("spec_idx", col("leaf_id"), q, 2))
      .select("vec_id", "leaf_id")
    val leaves = model.topLeaves(q.toArray, 2)
    val expect = spark.read.parquet(path)
      .filter(col("leaf_id").isin(leaves: _*))
      .select("vec_id", "leaf_id").collect().toSet
    assert(df.collect().toSet == expect)
    assert(!df.queryExecution.executedPlan.toString
      .contains("graft_ann_probe"))
  }

  test("the SQL-text E2E gate partition-prunes its written index") {
    val df = graft.SparkEntry.queries("v_ann_sql_e2e")(spark, sf)
    // sparkPlan, not executedPlan: AQE's AdaptiveSparkPlanExec has no
    // children to collect through, and partition filters are fixed at
    // planning anyway
    val pruned = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.exists(_.partitionFilters.exists(_.toString.contains("leaf_id")))
    assert(pruned,
      "v_ann_sql_e2e must partition-prune the written leaf_id layout")
  }

  test("an unregistered index name fails loudly, never full-scans") {
    val (path, _) = setup
    val err = intercept[Exception] {
      spark.read.parquet(path)
        .filter(AnnPruning.probe("no_such_index", col("leaf_id"), q, 2))
        .collect()
    }
    assert(err.getMessage.contains("no index named") ||
      Option(err.getCause).exists(_.getMessage.contains("no index named")),
      s"unexpected error: ${err.getMessage}")
  }
}
