package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join edge semantics on a hand-built fixture. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("equal timestamps match; no-prior rows get nulls; latest prior wins") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // before any right row
      (1L, ts("2024-01-01 12:00:00"), 101L), // equal ts -> matches
      (1L, ts("2024-01-01 15:00:00"), 102L), // two priors -> latest (13:00)
      (2L, ts("2024-01-01 09:00:00"), 200L)  // key with no right rows at all
    ).toDF("user_id", "ts", "click_id")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (1L, ts("2024-01-01 13:00:00"), 13.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOfJoin.asOfJoinLast(left, right, "user_id", "ts", Seq("ts", "value"))
      .select(col("click_id"), col("asof_ts"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap

    assert(out(100L) == (None, None))
    assert(out(101L) == (Some(ts("2024-01-01 12:00:00")), Some(12.0)))
    assert(out(102L) == (Some(ts("2024-01-01 13:00:00")), Some(13.0)))
    assert(out(200L) == (None, None))
  }

  test("forward as-of: equal ts matches, earliest following wins, no-later rows get nulls") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // two laters -> earliest (12:00)
      (1L, ts("2024-01-01 12:00:00"), 101L), // equal ts -> matches
      (1L, ts("2024-01-01 15:00:00"), 102L), // after all right rows -> null
      (2L, ts("2024-01-01 09:00:00"), 200L)  // key with no right rows at all
    ).toDF("user_id", "ts", "click_id")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (1L, ts("2024-01-01 13:00:00"), 13.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOfJoin.asOfJoinNext(left, right, "user_id", "ts", Seq("ts", "value"))
      .select(col("click_id"), col("asof_ts"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.get(2))))).toMap
    assert(out(100L) == ((Some(ts("2024-01-01 12:00:00")), Some(12.0))))
    assert(out(101L) == ((Some(ts("2024-01-01 12:00:00")), Some(12.0))), "equal ts matches under >=")
    assert(out(102L) == ((None, None)), "nothing at-or-after")
    assert(out(200L) == ((None, None)), "keyless left rows survive with nulls")
  }

  test("a NULL field in the matched right row stays NULL (no cross-row mixing)") {
    val left = Seq((1L, ts("2024-01-01 11:30:00"), 100L))
      .toDF("user_id", "ts", "click_id")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Double]) // latest, NULL value
    ).toDF("user_id", "ts", "value")
    val row = AsOfJoin.asOfJoinLast(left, right, "user_id", "ts", Seq("ts", "value"))
      .select(col("asof_ts"), col("asof_value")).head()
    assert(row.getTimestamp(0) == ts("2024-01-01 11:00:00"))
    assert(row.isNullAt(1), "value must come from the MATCHED row, not an older one")
  }

  test("row count is exactly the left side's (no fan-out, no drops)") {
    val ev = graft.engine.Tables.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev.where(col("event_type") === "view")
      .dropDuplicates("user_id", "ts")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = AsOfJoin.asOfJoinLast(clicks, views, "user_id", "ts", Seq("value"))
    assert(joined.count() == clicks.count())
  }
}
