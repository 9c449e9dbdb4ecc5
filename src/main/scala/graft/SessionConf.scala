package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides.
  *
  * Structured Streaming bakes `spark.sql.shuffle.partitions` into the
  * stateful-operator layout at stream start: every micro-batch then
  * materializes and checkpoints one state-store partition per shuffle
  * partition per stateful operator (two per stream-stream join side).
  * At the session default of 32-200 partitions that fixed cost—not the
  * data—dominates a small-batch stream (q_stream_join spent ~25 s of
  * 27 s on empty state stores). Scoping the setting to the streaming
  * query keeps state partitioning (which IS wanted at scale, sized to
  * the key space) without taxing every micro-batch with hundreds of
  * near-empty stores.
  */
object SessionConf {
  val StreamShufflePartitions = 8

  /** Run `body` with `spark.sql.shuffle.partitions` = n, restoring the
    * previous value afterwards. The override must span `.start()` —
    * the stream captures the value at that point, not at execution.
    */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body
    finally s.conf.set(key, prev)
  }

  /** Streaming-query default: small fixed state partitioning. */
  def withStreamShuffle[T](s: SparkSession)(body: => T): T =
    withShufflePartitions(s, StreamShufflePartitions)(body)

  /** Release everything a finished query can leave pinned in the JVM,
    * so a long single-session harness run (Bench times 111+ queries
    * back to back) measures each query, not accumulated memory decay:
    *
    *  - cached DataFrames (`clearCache`) — persisted LSH signatures,
    *    shingle sets, IVF assignments;
    *  - temp views — each streaming query's memory SINK registers one,
    *    and its buffered rows live exactly as long as the view;
    *  - `localCheckpoint` RDD blocks — checkpoint blocks are NOT cache
    *    entries, so `clearCache` never frees them; unpersist every
    *    still-persistent RDD directly.
    *
    * Only call AFTER the query's result has been fully consumed
    * (counted/written): dropping the sink view or checkpoint blocks
    * under a live consumer would fail the read.
    */
  def releaseQueryResources(s: SparkSession): Unit = {
    s.catalog.clearCache()
    s.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => s.catalog.dropTempView(t.name))
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
