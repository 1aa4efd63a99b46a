package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventOps

/** The Structured Streaming twin must agree with the batch window
  * aggregation (ADVICE round-1: the streaming path was dead, unverified
  * code).
  */
class StreamingSpec extends SparkTestBase {

  test("streaming tumbling counts == batch tumbling counts (memory sink, drain-all)") {
    val stream = EventOps.streamingTumblingCounts(spark, sfDir)
    val q = stream.writeStream
      .format("memory")
      .queryName("graft_stream_test")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    val streamed = spark.table("graft_stream_test")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val batch = EventOps.tumblingAgg(spark, sfDir)
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch,
      s"streaming/batch divergence: only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming session windows == batch session windows (memory sink, drain-all)") {
    val q = EventOps.streamingSessionCounts(spark, sfDir).writeStream
      .format("memory")
      .queryName("graft_session_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("graft_session_test")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventOps.sessionAgg(spark, sfDir)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"session divergence: only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }
}
