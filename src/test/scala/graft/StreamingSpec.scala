package graft

import graft.streaming.StreamUpdate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("stream upsert: micro-batches append, reader resolves LWW") {
    implicit val sqlCtx = spark.sqlContext
    val table = Files.createTempDirectory("graft-su").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft-ck").toString

    val stream = MemoryStream[(Long, String, Int)]
    stream.addData((1L, "v1", 1), (2L, "v1", 1))
    val q1 = StreamUpdate.startUpsertStream(
      stream.toDF.toDF("id", "content", "version"), table, ckpt)
    q1.awaitTermination()

    stream.addData((1L, "v2", 2), (3L, "v1", 1))
    val q2 = StreamUpdate.startUpsertStream(
      stream.toDF.toDF("id", "content", "version"), table, ckpt)
    q2.awaitTermination()

    val resolved = StreamUpdate.readResolved(spark, table, "id", "version")
      .select("id", "content").as[(Long, String)].collect().toMap
    assert(resolved == Map(1L -> "v2", 2L -> "v1", 3L -> "v1"))

    StreamUpdate.compact(spark, table, "id", "version")
    val compacted = spark.read.parquet(table)
    assert(compacted.count() == 3)
    val after = StreamUpdate.readResolved(spark, table, "id", "version")
      .select("id", "content").as[(Long, String)].collect().toMap
    assert(after == resolved)
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    stream.addData((t, 1L), (t, 1L), (t, 2L),
      (Timestamp.valueOf("2024-01-01 10:00:05"), 1L))
    val deduped = stream.toDF.toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dd").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("dedup-within-watermark EVICTS state once the watermark passes") {
    // the bounded-state claim of q_stream_dedup_wm: keys whose event
    // time falls behind watermark − delay leave the store, so state
    // tracks the delay window, not the stream length
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val deduped = stream.toDF.toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddev").start()
    // batch 0: 50 keys at 10:00
    stream.addData((0 until 50).map(i =>
      (Timestamp.valueOf("2024-01-01 10:00:00"), i.toLong)): _*)
    q.processAllAvailable()
    // batch 1: 50 new keys three hours later — watermark jumps far
    // past 10:00 + 10 min, so batch-0 state must be evicted
    stream.addData((0 until 50).map(i =>
      (Timestamp.valueOf("2024-01-01 13:00:00"), 100L + i)): _*)
    q.processAllAvailable()
    // one more empty-ish batch so eviction metrics settle
    stream.addData((Timestamp.valueOf("2024-01-01 13:00:01"), 999L))
    q.processAllAvailable()
    val lastState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators.head
    q.stop()
    assert(lastState.numRowsTotal < 100,
      s"state holds ${lastState.numRowsTotal} rows — nothing was evicted")
  }

  test("stream-static join enriches a stream with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val stream = MemoryStream[(Long, Double)]
    stream.addData((1L, 10.0), (2L, 20.0), (999999L, 5.0))
    val joined = stream.toDF.toDF("user_id", "value")
      .join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enrich").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich")
      .select("user_id", "c_mktsegment")
      .as[(Long, Option[String])].collect().toMap
    assert(rows.size == 3)
    assert(rows(1L).isDefined && rows(999999L).isEmpty)
  }

  test("watermarked tumbling windows aggregate event time") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val t0 = Timestamp.valueOf("2024-01-01 10:00:30")
    val t1 = Timestamp.valueOf("2024-01-01 10:00:55")
    val t2 = Timestamp.valueOf("2024-01-01 10:01:10")
    stream.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 3.0))
    val agg = StreamUpdate.windowedCounts(
      stream.toDF.toDF("ts", "event_type", "value"),
      "ts", "event_type", "1 minute", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wc").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc")
      .select(col("window.start").cast("string"), col("event_type"),
        col("n"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 10:01:00", "view", 1L, 3.0)))
  }
}
