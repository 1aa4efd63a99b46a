package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TimeSeries

/** Semantic pins for the time-series family: seasonality, ACF, CUSUM
  * (closed form == the textbook recursion), Kaplan-Meier.
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  /** Orders fixture: one order per (day, cents) pair. */
  private def ordersOf(rows: Seq[(String, Double)]): DataFrame =
    rows.zipWithIndex.map { case ((day, price), i) =>
      (i.toLong, 1L, "O", price, Timestamp.valueOf(s"$day 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("acf: hand-computed lags on the alternating series 1,2,1,2 cents") {
    // d = 4x - 6 = [-2,2,-2,2], den = 16
    // lag1: -4-4-4 = -12 -> -0.75; lag2: 4+4 = 8 -> 0.5; lag3: -4 -> -0.25
    val orders = ordersOf(Seq(
      ("2024-01-01", 0.01), ("2024-01-02", 0.02),
      ("2024-01-03", 0.01), ("2024-01-04", 0.02)))
    val r = TimeSeries.acf(orders, maxLag = 3).collect()
    assert(r.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("n_pairs")).toSeq == Seq(3L, 2L, 1L))
    assert(r.map(_.getAs[Double]("acf")).toSeq == Seq(-0.75, 0.5, -0.25))
  }

  test("acf: calendar gaps align on real dates, not row positions") {
    // days 1,2,4: lag1 pairs only (1,2); lag2 pairs only (2,4); lag3 (1,4)
    val orders = ordersOf(Seq(
      ("2024-01-01", 0.01), ("2024-01-02", 0.03), ("2024-01-04", 0.02)))
    val r = TimeSeries.acf(orders, maxLag = 3).collect()
    assert(r.map(r0 => (r0.getAs[Long]("lag"), r0.getAs[Long]("n_pairs"))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("seasonality: two Mondays and one Tuesday, exact index ratios") {
    // Mondays 2024-01-01/08 at 2.00 each, Tuesday 2024-01-02 at 5.00
    // avg(mon)=200, avg(tue)=500, overall avg=300 -> idx 2/3 and 5/3
    val orders = ordersOf(Seq(
      ("2024-01-01", 2.00), ("2024-01-08", 2.00), ("2024-01-02", 5.00)))
    val r = TimeSeries.seasonality(orders).collect()
    assert(r.length == 2)
    val mon = r.find(_.getAs[Long]("dow") == 1L).get
    val tue = r.find(_.getAs[Long]("dow") == 2L).get
    assert(mon.getAs[Long]("n_days") == 2L && mon.getAs[Long]("sum_cents") == 400L)
    assert(mon.getAs[Double]("seasonal_index") == 200.0 / 300.0)
    assert(tue.getAs[Double]("seasonal_index") == 500.0 / 300.0)
  }

  test("cusum: closed form == the textbook max(0, s+z) recursion, planted level shift flags") {
    // 10 quiet days at 1.00 then 10 shifted days at 3.00
    val days = (1 to 20).map(d => (f"2024-01-$d%02d", if (d <= 10) 1.00 else 3.00))
    val orders = ordersOf(days)
    val got = TimeSeries.cusum(orders).orderBy("day").collect()

    // JVM mirror of the recursion with the same self-fit slack
    val cents = days.map { case (_, p) => math.floor(p * 100 + 0.5).toLong }
    val n = cents.length.toLong
    val s = cents.sum
    val dv = cents.map(c => n * c - s)
    val den = dv.map(d => BigInt(d) * BigInt(d)).sum
    val slack = math.floor(math.sqrt(den.toDouble / n) / 2).toLong
    var acc = 0L
    val expected = dv.map { d =>
      acc = math.max(0L, acc + (d - slack))
      (acc.toDouble / n, acc > slack * 8)
    }
    assert(got.length == 20)
    got.zip(expected).foreach { case (row, (cu, flag)) =>
      assert(row.getAs[Double]("cusum") == cu)
      assert((row.getAs[Int]("shift_flag") == 1) == flag)
    }
    // the shift is detected in the shifted regime and never before it
    assert(got.take(10).forall(_.getAs[Int]("shift_flag") == 0))
    assert(got.drop(12).exists(_.getAs[Int]("shift_flag") == 1))
  }

  test("stl decompose: constant series has zero seasonal and residual; components reconstruct") {
    val flat = ordersOf((1 to 14).map(d => (f"2024-01-$d%02d", 2.00)))
    val r = TimeSeries.stlDecompose(flat).collect()
    assert(r.length == 14)
    r.foreach { row =>
      assert(row.getAs[Double]("trend") == 200.0)
      assert(row.getAs[Double]("seasonal") == 0.0)
      assert(row.getAs[Double]("residual") == 0.0)
    }
    // varying series: trend + seasonal + residual ~ the observation
    val vary = ordersOf((1 to 21).map(d => (f"2024-01-$d%02d", 1.00 + (d % 7) * 0.50)))
    TimeSeries.stlDecompose(vary).collect().foreach { row =>
      val recon = row.getAs[Double]("trend") + row.getAs[Double]("seasonal") +
        row.getAs[Double]("residual")
      assert(math.abs(recon - row.getAs[Long]("daily_cents").toDouble) < 1e-9)
    }
  }

  test("survival km: hand-computed 3-user life table with censoring") {
    // A converts at t=2, B censored at study end (t=4), C converts at t=0
    def ev(id: Long, ts: String, user: Long, typ: String) =
      (id, Timestamp.valueOf(ts), user, typ, 1.0, "")
    val events = Seq(
      ev(1, "2024-01-01 08:00:00", 1, "view"),
      ev(2, "2024-01-03 09:00:00", 1, "purchase"),
      ev(3, "2024-01-01 10:00:00", 2, "view"),
      ev(4, "2024-01-05 11:00:00", 2, "click"),
      ev(5, "2024-01-02 12:00:00", 3, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.survivalKm(events).collect()
    val byT = r.map(x => x.getAs[Long]("t") ->
      ((x.getAs[Long]("n_risk"), x.getAs[Long]("n_events"),
        x.getAs[Long]("n_censored"), x.getAs[Double]("survival")))).toMap
    assert(byT.keySet == Set(0L, 2L, 4L))
    assert(byT(0L) == ((3L, 1L, 0L, 1.0 * (2.0 / 3.0))))
    assert(byT(2L) == ((2L, 1L, 0L, 1.0 * (2.0 / 3.0) * (1.0 / 2.0))))
    assert(byT(4L) == ((1L, 0L, 1L, 1.0 * (2.0 / 3.0) * (1.0 / 2.0) * 1.0)))
  }

  test("survival km: monotone non-increasing and censoring keeps survival flat") {
    val events = graft.engine.Tables.load(spark, sfDir, "events")
    val r = TimeSeries.survivalKm(events).orderBy("t").collect()
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("survival") <= a.getAs[Double]("survival") + 1e-15)
        if (b.getAs[Long]("n_events") == 0)
          assert(b.getAs[Double]("survival") == a.getAs[Double]("survival"))
      case _ =>
    }
    assert(r.forall(x => x.getAs[Long]("n_risk") >= x.getAs[Long]("n_events")))
  }

  test("ljung-box: Q matches a JVM mirror from the same ACF terms; h counts present lags") {
    val days = (1 to 20).map(d => (f"2024-01-$d%02d", 1.00 + (d % 3) * 0.50))
    val orders = ordersOf(days)
    val row = TimeSeries.ljungBox(orders, maxLag = 3).head()
    val acf = TimeSeries.acf(orders, maxLag = 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    val n = 20.0
    val q = n * (n + 2.0) * (1L to 3L).map(k => acf(k) * acf(k) / (n - k)).sum
    assert(row.getAs[Long]("n_days") == 20L)
    assert(row.getAs[Long]("h") == 3L)
    assert(math.abs(row.getAs[Double]("q_stat") - q) < 1e-9)
    // the planted period-3 series is emphatically not white noise
    assert(row.getAs[Int]("reject_white_noise") == 1)
  }

  test("seasonal anomalies: planted weekday-pattern spike flags only the broken day") {
    // perfect weekly pattern for 5 weeks, then one day at 10x
    val d0 = java.time.LocalDate.parse("2024-01-01")
    val days = (1 to 35).map { d =>
      val base = 1.00 + (d % 7) * 0.50
      (d0.plusDays(d - 1).toString, if (d == 31) base * 10 else base)
    }
    val r = TimeSeries.seasonalAnomalies(ordersOf(days)).collect()
    val flagged = r.filter(_.getAs[Int]("is_anomaly") == 1)
      .map(_.getAs[java.sql.Date]("day").toString).toSeq
    assert(flagged.contains("2024-01-31"), s"spike day must flag: $flagged")
    assert(flagged.size <= 3, s"pattern days must mostly stay quiet: $flagged")
  }

  test("Theil-Sen: one corrupted day cannot move the median slope off the planted line") {
    // y = 10x + 5 cents on nine consecutive days, except day index 4
    // is corrupted to 1000 cents. 28 of 36 pair slopes are exactly 10
    // -> median slope 10; residual median sits on the clean line.
    val base = java.time.LocalDate.parse("1995-01-01")
    val rows = (0 to 8).map { i =>
      val cents = if (i == 4) 1000L else 10L * i + 5L
      (base.plusDays(i).toString, cents / 100.0)
    }
    val r = TimeSeries.theilSen(ordersOf(rows)).head()
    assert(r.getAs[Long]("n_pairs") == 36L)
    assert(r.getAs[Long]("n_days") == 9L)
    assert(r.getAs[Double]("slope_cents_per_day") == 10.0)
    // x is datediff from 1992-01-01: 1995-01-01 -> 1096. Clean residual
    // = 10i + 5 - 10(1096 + i) = 5 - 10960; the outlier residual is
    // higher, so the median stays on the clean line.
    assert(r.getAs[Double]("intercept_cents") == 5.0 - 10960.0)
  }

  test("Siegel repeated median: robust to the planted outlier and matches a JVM mirror") {
    // same planted series as the Theil-Sen spec: each clean anchor's
    // per-point slope median is exactly 10 (7 of its 8 slopes are 10),
    // and the corrupted anchor's deviant median is voted down by the
    // outer median — the repeated-median 50% breakdown in action
    val base = java.time.LocalDate.parse("1995-01-01")
    val rows = (0 to 8).map { i =>
      val cents = if (i == 4) 1000L else 10L * i + 5L
      (base.plusDays(i).toString, cents / 100.0)
    }
    val r = TimeSeries.siegelTrend(ordersOf(rows)).head()
    assert(r.getAs[Long]("n_points") == 9L)
    assert(r.getAs[Long]("n_days") == 9L)
    assert(r.getAs[Double]("slope_cents_per_day") == 10.0)
    assert(r.getAs[Double]("intercept_cents") == 5.0 - 10960.0)
    // JVM mirror of the repeated median on the same integer series
    val cents = (0 to 8).map(i => if (i == 4) 1000.0 else 10.0 * i + 5.0)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val mirror = med((0 to 8).map { i =>
      med((0 to 8).filter(_ != i).map(j => (cents(j) - cents(i)) / (j - i)))
    })
    assert(r.getAs[Double]("slope_cents_per_day") == mirror)
  }
}
