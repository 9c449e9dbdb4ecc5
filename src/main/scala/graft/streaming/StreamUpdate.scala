package graft.streaming

import graft.sources.MetadataStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest — the STREAM_UPDATE analog
  * (/root/reference/vector_store/utils/index_manager.py:53): incoming
  * datapoints are appended to the index table incrementally, no
  * rebuild; readers resolve last-write-wins on the datapoint id.
  *
  * Shape at scale: foreachBatch appends each micro-batch as new
  * parquet files (cheap, parallel, no read-modify-write); the LWW
  * window on read and a periodic [[compact]] bound read amplification.
  * Event-time analytics use watermarked tumbling windows so state is
  * bounded and late data within the watermark is folded in.
  */
object StreamUpdate {

  /** Start an append-only upsert stream into `tablePath`. */
  def startUpsertStream(updates: DataFrame, tablePath: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("__batch_id", lit(batchId))
          .write.mode("append").parquet(tablePath)
      }
      .start()

  /** Read the current state of an upsert table (LWW per id). */
  def readResolved(spark: SparkSession, tablePath: String, key: String,
      versionCol: String): DataFrame =
    MetadataStore.resolve(spark.read.parquet(tablePath), key, col(versionCol))

  /** Rewrite the log to one row per key (bounds read amplification).
    *
    * Writes to a sibling temp directory and swaps via rename — never
    * overwrites the path it is reading: a cache-evicted partition
    * recomputed mid-overwrite would otherwise read already-deleted
    * input files and corrupt the log.
    */
  def compact(spark: SparkSession, tablePath: String, key: String,
      versionCol: String): Unit = {
    val hadoopPath = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tablePath + ".compact-tmp")
    readResolved(spark, tablePath, key, versionCol)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(tablePath + ".compact-old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(hadoopPath, old))
      throw new java.io.IOException(s"compact: cannot move $tablePath aside")
    if (!fs.rename(tmp, hadoopPath)) {
      fs.rename(old, hadoopPath) // roll back
      throw new java.io.IOException(s"compact: cannot install $tmp")
    }
    fs.delete(old, true)
  }

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
