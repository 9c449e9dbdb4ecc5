package graft

import graft.operators.{IvfIndex, Serving, ServingManifest}
import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._

/** Serving-layout cloning — the backup / blue-green half of the
  * deployment lifecycle: a live clone answers exactly like the
  * source (registry included), a version-pinned clone answers
  * exactly like `openAt` on the source (registry excluded), the
  * clone's history is fresh and independent, and an unsafe
  * destination is refused.
  */
class ServingCloneSpec extends SparkTestBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_clone_$tag")
      .toString + "/idx"

  /** Build a layout, then two appends (v2, v3), the second of which
    * LWW-supersedes some v1 rows — so the registry visibly matters.
    */
  private def lifecycle(tag: String): (String, Array[Double]) = {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        lit(1L).as("version"))
    val (indexed, model) = IvfIndex.build(base, "vec_id", "v", 8)
    val dir = tmp(tag)
    IvfIndex.write(indexed, dir, model)
    val up1 = base.filter(col("vec_id") % 31 === 3)
      .withColumn("vec_id", col("vec_id") + 200000)
      .withColumn("v", transform(col("v"), x => x * 1.5))
      .withColumn("version", lit(2L))
    IndexMaintenance.appendToServing(spark, dir, up1,
      "vec_id", "v", "version")
    // supersede EXISTING ids: only registry resolution hides the old rows
    val up2 = base.filter(col("vec_id") % 45 === 11)
      .withColumn("v", transform(col("v"), x => x * -2.0))
      .withColumn("version", lit(3L))
    IndexMaintenance.appendToServing(spark, dir, up2,
      "vec_id", "v", "version")
    val q = base.filter(col("vec_id") === 7)
      .select("v").head().getSeq[Double](0).toArray
    (dir, q)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("live clone: fresh open answers exactly like the source") {
    val (src, q) = lifecycle("live")
    val dst = tmp("live_dst")
    val n = IndexMaintenance.cloneServing(spark, src, dst)
    assert(n > 0)
    assert(ServingManifest.verify(spark, dst) == ((0L, 0L)),
      "clone manifest must match the copied files")
    assert(ServingManifest.versions(spark, dst) == Seq(1),
      "a clone starts a fresh history at v=1")
    val a = Serving.open(spark, src, "vec_id", "v").search(q, 3, 12)
    val b = Serving.open(spark, dst, "vec_id", "v").search(q, 3, 12)
    assert(rows(a) == rows(b),
      "live clone must serve bit-identical results (registry included)")
  }

  test("pinned clone equals openAt on the source; registry excluded") {
    val (src, q) = lifecycle("pin")
    val dst = tmp("pin_dst")
    IndexMaintenance.cloneServing(spark, src, dst, Some(2))
    assert(ServingManifest.verify(spark, dst) == ((0L, 0L)))
    // openAt semantics: raw rows as stored then — no registry
    assert(!new java.io.File(dst + "/_graft_delta").exists,
      "a pinned clone must not carry the live delta registry")
    val a = Serving.openAt(spark, src, 2, "vec_id", "v").get.search(q, 3, 12)
    val b = Serving.open(spark, dst, "vec_id", "v").search(q, 3, 12)
    assert(rows(a) == rows(b),
      "pinned clone must equal the source's snapshot at that version")
    // and the v3 file-set is strictly larger than the clone carried
    val srcFiles = ServingManifest.filesAt(spark, src, 3).get.size
    val dstFiles = ServingManifest.liveFiles(spark, dst).get.size
    assert(dstFiles < srcFiles,
      s"pinned clone carried $dstFiles files, source v3 has $srcFiles")
  }

  test("clone history is independent: appends to the clone leave the source") {
    val (src, q) = lifecycle("indep")
    val dst = tmp("indep_dst")
    IndexMaintenance.cloneServing(spark, src, dst)
    val before = rows(Serving.open(spark, src, "vec_id", "v").search(q, 3, 12))
    val extra = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 97 === 5)
      .select((col("vec_id") + 900000).as("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        lit(9L).as("version"))
    IndexMaintenance.appendToServing(spark, dst, extra,
      "vec_id", "v", "version")
    assert(ServingManifest.versions(spark, dst) == Seq(1, 2))
    assert(rows(Serving.open(spark, src, "vec_id", "v").search(q, 3, 12))
      == before, "appending to the clone must not disturb the source")
  }

  test("unknown pinned version and dirty destination fail loudly") {
    val (src, _) = lifecycle("fail")
    intercept[IllegalArgumentException] {
      IndexMaintenance.cloneServing(spark, src, tmp("fail_v"), Some(99))
    }
    val dirty = tmp("fail_dirty")
    new java.io.File(dirty).mkdirs()
    new java.io.File(dirty + "/junk").createNewFile()
    intercept[IllegalArgumentException] {
      IndexMaintenance.cloneServing(spark, src, dirty)
    }
  }
}
