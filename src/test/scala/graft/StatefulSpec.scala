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
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[Event].collect()
    // feed in two micro-batches split by time (sessions span batches)
    val (b1, b2) = all.sortBy(e => (e.us, e.event_id)).splitAt(all.length / 2)
    stream.addData(b1.toIndexedSeq)
    val q = StatefulSessionize.sessionize(stream.toDS())
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
}
