package graft

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful streaming sessionization matches batch sessionize") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Event]
    val all = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("ts").cast("timestamp").as("ts"))
      .as[Event].collect()
    // feed in two micro-batches split by time (sessions span batches)
    val (b1, b2) = all.sortBy(e => (e.us, e.event_id)).splitAt(all.length / 2)
    stream.addData(b1.toIndexedSeq)
    // watermark delay longer than the event span: nothing is dropped
    // as late and no idle timeout fires — pure gap-split semantics,
    // directly comparable with batch
    val q = StatefulSessionize.sessionize(stream.toDS(),
        watermarkDelay = "90 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    stream.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    // closed sessions from the stream (open tail sessions won't have
    // been emitted — compare only sessions the batch side also closes)
    val streamed = spark.table("sess_out").as[Session].collect()
      .map(ss => (ss.user_id, ss.session_id) -> (ss.n_events, ss.start_us, ss.end_us))
      .toMap

    val batch = SparkEntry.queries("q_sessionize")(spark, sf)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val lastSession = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closedBatch = batch
      .filter { case (u, sid, _, _, _) => sid != lastSession(u) }
      .map { case (u, sid, n, st, en) => (u, sid) -> ((n, st, en)) }
      .toMap

    assert(closedBatch.nonEmpty)
    closedBatch.foreach { case (k, v) =>
      assert(streamed.get(k).contains(v),
        s"session $k: stream=${streamed.get(k)} batch=$v")
    }
  }

  test("event-time timeout flushes idle trailing sessions") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, id: Long, usOffset: Long): Event = {
      val us = 1700000000000000L + usOffset
      Event(u, id, us, new java.sql.Timestamp(us / 1000L))
    }
    val stream = MemoryStream[Event]
    val q = StatefulSessionize.sessionize(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_flush").start()
    // user 1: two events, then silence forever
    stream.addData(ev(1, 1, 0L), ev(1, 2, 1000000L))
    q.processAllAvailable()
    // user 2's events 2h later advance the watermark past user 1's
    // gap; the timeout fires on the batch AFTER the watermark moves
    stream.addData(ev(2, 3, 7200000000L))
    q.processAllAvailable()
    stream.addData(ev(2, 4, 7210000000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_flush").as[Session].collect()
      .filter(_.user_id == 1L)
    assert(got.nonEmpty, "idle session for user 1 was never flushed")
    assert(got.head.n_events == 2L)
    assert(got.head.end_us == 1700000001000000L)
  }
}
