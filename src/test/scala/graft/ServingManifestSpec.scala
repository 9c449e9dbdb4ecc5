package graft

import graft.operators.{IvfIndex, ServingManifest}
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._

/** The file manifest as the serving open path: every writer keeps it
  * consistent with the layout, a manifest-backed open sees exactly
  * the listed rows with pruning intact, and drift fails loudly in
  * both directions.
  */
class ServingManifestSpec extends SparkTestBase {

  private def freshServe(tag: String): (String, IvfIndex.Model) = {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"), lit(1L).as("version"))
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "v", 8)
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_manifest_$tag").toString + "/idx"
    IvfIndex.write(indexed, dir, model)
    (dir, model)
  }

  test("write() builds a manifest that matches the actual listing") {
    val (dir, _) = freshServe("build")
    assert(ServingManifest.exists(spark, dir))
    assert(ServingManifest.verify(spark, dir) == ((0L, 0L)))
  }

  test("manifest open sees the same rows as a listing open, pruned alike") {
    val (dir, model) = freshServe("open")
    val viaManifest = ServingManifest.open(spark, dir).get
    val viaListing = spark.read.parquet(dir)
    assert(viaManifest.columns.sorted.sameElements(viaListing.columns.sorted))
    assert(viaManifest.count() == viaListing.count())

    // partition pruning still reaches the scan through the explicit
    // file set: an In-list on leaf_id lands in partitionFilters, not
    // a post-scan filter
    val pruned = viaManifest.filter(col("leaf_id").isin(0, 1))
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty,
      s"leaf In-list did not prune: ${scan.partitionFilters}")
    assert(pruned.count() ==
      spark.read.parquet(dir).filter(col("leaf_id").isin(0, 1)).count())
    assert(model.centroids.length == 8)

    // range predicates prune through the manifest's listFiles too —
    // the bound-reference evaluation is not In-list-specific
    val ranged = viaManifest.filter(col("leaf_id") >= 3 &&
      col("leaf_id") < 6)
    val rScan = ranged.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(rScan.partitionFilters.nonEmpty)
    assert(ranged.count() == spark.read.parquet(dir)
      .filter(col("leaf_id") >= 3 && col("leaf_id") < 6).count())
  }

  test("appendToServing reconciles the touched leaves") {
    val (dir, _) = freshServe("append")
    val batch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 37 === 0)
      .select((col("vec_id") + 500000).as("vec_id"),
        col("embedding").cast("array<double>").as("v"), lit(2L).as("version"))
    IndexMaintenance.appendToServing(spark, dir, batch,
      "vec_id", "v", "version")
    assert(ServingManifest.verify(spark, dir) == ((0L, 0L)),
      "appended files must be in the manifest")
    val got = ServingManifest.open(spark, dir).get
      .filter(col("vec_id") >= 500000).select("vec_id").distinct().count()
    assert(got == batch.count(),
      "appended rows must be visible through the manifest open")
  }

  test("rebalanceOverflow keeps the manifest consistent") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"), lit(1L).as("version"))
    // tiny leaf count → at least one leaf far over a tight bound
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "v", 4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_reb").toString + "/idx"
    IvfIndex.write(indexed, dir, model)
    // an eighth of the stored rows: with 4 leaves the largest leaf
    // holds at least a quarter, so overflow is guaranteed
    val bound = (indexed.count() / 8).toInt
    val (splits, _) = IndexMaintenance.rebalanceOverflow(
      spark, dir, "vec_id", "v", bound)
    assert(splits > 0, "the tight bound must force at least one split")
    assert(ServingManifest.verify(spark, dir) == ((0L, 0L)),
      "rebalanced directories must be re-reflected in the manifest")
  }

  test("compactServing carries the manifest across the swap") {
    val (dir, _) = freshServe("compact")
    val batch = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 53 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"), lit(9L).as("version"))
    IndexMaintenance.appendToServing(spark, dir, batch,
      "vec_id", "v", "version")
    IndexMaintenance.compactServing(spark, dir, "vec_id", "version")
    assert(ServingManifest.verify(spark, dir) == ((0L, 0L)))
    // superseded copies are gone; the manifest open serves the winner
    val winners = ServingManifest.open(spark, dir).get
      .filter(col("vec_id") % 53 === 0)
      .groupBy("vec_id").agg(countDistinct("version").as("nv"))
      .filter(col("nv") =!= 1)
    assert(winners.count() == 0)
  }

  test("drift is detected in both directions and a stale read is loud") {
    val (dir, _) = freshServe("drift")
    // unlisted file on disk (the silent-invisibility direction)
    val leafDir = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("leaf_id=")).head
    val dataFile = leafDir.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).head
    val copy = new java.io.File(leafDir, "part-drift.parquet")
    java.nio.file.Files.copy(dataFile.toPath, copy.toPath)
    assert(ServingManifest.verify(spark, dir)._2 == 1L,
      "an unlisted on-disk file must count as drift")
    assert(copy.delete())

    // listed-but-deleted file (the loud direction): resolution of the
    // explicit file set fails immediately — even before a scan runs
    assert(dataFile.delete())
    intercept[Exception] { ServingManifest.open(spark, dir).get.count() }
  }

  test("pre-manifest layouts fall back to a listing read") {
    val (dir, _) = freshServe("fallback")
    // simulate an old layout: drop the manifest
    val m = new java.io.File(ServingManifest.manifestDir(dir))
    m.listFiles().foreach(_.delete()); assert(m.delete())
    assert(!ServingManifest.exists(spark, dir))
    assert(ServingManifest.open(spark, dir).isEmpty)
    val n0 = spark.read.parquet(dir).count()
    assert(ServingManifest.openOrRead(spark, dir).count() == n0)
    // reconcile on a pre-manifest layout is a declared no-op
    ServingManifest.reconcile(spark, dir, Seq(0, 1))
    assert(!ServingManifest.exists(spark, dir))
  }
}
