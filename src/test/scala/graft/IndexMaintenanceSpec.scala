package graft

import graft.streaming.IndexMaintenance
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IndexMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("stream-appended vectors become searchable after recluster") {
    val log = Files.createTempDirectory("ivf-log").toString + "/log"
    val serve = Files.createTempDirectory("ivf-srv").toString + "/serve"

    // batch 1: the base corpus
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), lit(1).as("version"))
    IndexMaintenance.appendBatch(base, log)

    // batch 2: a new vector (id 9999) identical to vec 0 → should be
    // its top-1 neighbor after recluster; plus an update of vec 1
    val v0 = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val updates = Seq((9999L, v0, 1), (1L, v0, 2))
      .toDF("vec_id", "embedding", "version")
    IndexMaintenance.appendBatch(updates, log)

    val live = IndexMaintenance.liveCorpus(spark, log, "vec_id", "version")
    assert(live.count() == Tables.embeddings(spark, sf).count() + 1)
    // LWW: vec 1 now equals v0
    val v1 = live.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    assert(v1 == v0)

    val model = IndexMaintenance.recluster(spark, log, serve,
      "vec_id", "embedding", "version", numLeaves = 8)
    val hits = graft.operators.IvfIndex.search(spark, serve, model,
      v0.map(_.toDouble).toArray, nProbe = 2, k = 3, "vec_id", "embedding")
      .select("vec_id").as[Long].collect()
    // the clone (and the updated vec 1) must surface at the top
    assert(hits.take(3).toSet.intersect(Set(0L, 1L, 9999L)).size == 3,
      s"top-3 was ${hits.toSeq}")

    // lifecycle: the recluster wrote the FULL reopenable index — a
    // serving session that only knows the serve path loads the
    // POST-recluster model (both router levels rebuilt by build())
    // and probes identically to the returned one
    val reopened = graft.operators.IvfIndex.load(spark.newSession(), serve)
    assert(reopened.stats == model.stats)
    assert(reopened.centroids.zip(model.centroids).forall {
      case (a, b) => java.util.Arrays.equals(a, b)
    })
    assert(reopened.router.isEmpty == model.router.isEmpty)
    assert(reopened.topLeaves(v0.map(_.toDouble).toArray, 2) ==
      model.topLeaves(v0.map(_.toDouble).toArray, 2))
  }
}
