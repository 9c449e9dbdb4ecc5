package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ANN index maintenance — the full STREAM_UPDATE story
  * (/root/reference/vector_store/utils/index_manager.py:53): new
  * datapoints stream-append into the index log; reads resolve
  * last-write-wins; a periodic recluster pass re-fits the k-means
  * leaves and rewrites the partitioned index so query-time leaf
  * pruning stays balanced as the corpus drifts.
  *
  * At 100 TB: appends are cheap (new files), the recluster is a
  * scheduled batch job (sample-fit + full assign), and readers always
  * see a consistent snapshot (parquet file listing is atomic enough
  * per job; swap directories for stronger guarantees).
  */
object IndexMaintenance {

  /** Append a micro-batch of (id, vector, version) upserts. */
  def appendBatch(batch: DataFrame, logPath: String): Unit =
    batch.write.mode("append").parquet(logPath)

  /** Resolve the live corpus (LWW per id). */
  def liveCorpus(spark: SparkSession, logPath: String, id: String,
      versionCol: String): DataFrame =
    graft.sources.MetadataStore.resolve(
      spark.read.parquet(logPath), id, col(versionCol))

  /** Recluster: fit fresh leaves over the live corpus and rewrite the
    * serving index partitioned by leaf.
    */
  def recluster(spark: SparkSession, logPath: String, servePath: String,
      id: String, vecCol: String, versionCol: String, numLeaves: Int,
      seed: Long = 42L): IvfIndex.Model = {
    val live = liveCorpus(spark, logPath, id, versionCol)
    val (indexed, model) = IvfIndex.build(live, id, vecCol, numLeaves, seed)
    // the full reopenable index (data + model sidecar): a recluster
    // rebuilds BOTH router levels — build() re-fits the leaves and
    // re-derives the super-group router whenever the leaf count
    // warrants one — and a serving session picks the new model up by
    // reloading the sidecar
    IvfIndex.write(indexed, servePath, model)
    model
  }
}
