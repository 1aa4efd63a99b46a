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
    val ev = graft.engine.Tables.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
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

  test("interval-overlap join == brute force; each pair appears exactly once") {
    // crafted so some overlaps span MANY shared buckets (the k-times
    // hazard the first-shared-bucket predicate must collapse to one)
    def t(min: Long) = new Timestamp(min * 60000L)
    val a = Seq(
      (1L, 10L, t(0), t(300)),   // 5-hour window: shares many buckets
      (1L, 11L, t(500), t(520)),
      (2L, 12L, t(0), t(60)))
      .toDF("user_id", "aid", "a_start", "a_end")
    val b = Seq(
      (1L, 20L, t(100), t(400)), // overlaps 10 across ~3 hours
      (1L, 21L, t(510), t(530)), // overlaps 11
      (1L, 22L, t(600), t(700)), // no overlap
      (2L, 23L, t(61), t(100)))  // adjacent but disjoint (end < start)
      .toDF("user_id", "bid", "b_start", "b_end")
    val rows = RangeJoin.intervalOverlapJoin(a, "a_start", "a_end",
        b, "b_start", "b_end", "user_id", bucketSeconds = 3600L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length, "no pair may appear twice")
    val brute = a.join(b, Seq("user_id"))
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.toSet == brute)
    assert(brute == Set((10L, 20L), (11L, 21L)))
  }
}
