package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed range-join boundary semantics: inclusive endpoints, bucket
  * crossings, and equality with a plain inequality join.
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inclusive endpoints and bucket-boundary crossings match exactly") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L), // exactly at win_start
      (1L, ts("2024-01-01 10:30:00"), 2L), // exactly at win_end
      (1L, ts("2024-01-01 10:30:00.000001"), 3L), // just past the end
      (1L, ts("2024-01-01 10:29:59"), 4L), // inside, next bucket over
      (2L, ts("2024-01-01 10:15:00"), 5L)  // other key, no window
    ).toDF("user_id", "ts", "pid")
    val windows = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"))
    ).toDF("user_id", "wid", "win_start", "win_end")

    val got = RangeJoin.rangeJoinBucketed(points, "ts", windows,
        "win_start", "win_end", "user_id", bucketSeconds = 600L)
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (4L, 10L)),
      s"got $got") // 3 is past the end, 5 is another key
  }

  test("bucketed range join equals the plain inequality join on real data") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val wins = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("wid"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("win_end"))
    val bucketed = RangeJoin.rangeJoinBucketed(clicks, "ts", wins,
        "win_start", "win_end", "user_id", bucketSeconds = 3600L)
      .select("click_id", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = clicks.join(wins, Seq("user_id"))
      .where(col("ts") >= col("win_start") && col("ts") <= col("win_end"))
      .select("click_id", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == plain && bucketed.nonEmpty)
  }
}
