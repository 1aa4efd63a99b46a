package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.RevenueOps

/** Semantic pins for the revenue-analytics family: RFM scoring
  * direction, MoM growth arithmetic, cohort LTV accumulation,
  * inter-order gaps, Wilson interval properties.
  */
class RevenueOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeOrders(dir: String, rows: Seq[(Long, Long, Double, String)]): Unit =
    rows.zipWithIndex.map { case ((key, cust, price, day), _) =>
      (key, cust, "O", price, Timestamp.valueOf(s"$day 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

  test("rfm: best customer scores 333, worst 111, terciles split the planted trio") {
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    // cust 1: recent + frequent + big; cust 2: middle; cust 3: stale + rare + small
    writeOrders(dir, Seq(
      (1L, 1L, 500.0, "2024-03-30"), (2L, 1L, 500.0, "2024-03-29"),
      (3L, 1L, 500.0, "2024-03-28"),
      (4L, 2L, 100.0, "2024-03-15"), (5L, 2L, 100.0, "2024-03-14"),
      (6L, 3L, 10.0, "2024-01-01")))
    val r = RevenueOps.rfm(spark, dir).collect()
      .map(x => x.getAs[Long]("custkey") -> x.getAs[String]("segment")).toMap
    assert(r(1L) == "333")
    assert(r(3L) == "111")
    assert(r(2L) == "222")
  }

  test("mom growth: planted two-month nation series has exact growth and null first month") {
    val got = RevenueOps.momGrowth(spark, sfDir)
      .where(col("prev_cents").isNotNull).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val want = (row.getAs[Long]("cents") - row.getAs[Long]("prev_cents")).toDouble /
        row.getAs[Long]("prev_cents").toDouble
      assert(row.getAs[Double]("growth") == want)
    }
    val first = RevenueOps.momGrowth(spark, sfDir)
      .where(col("prev_cents").isNull).collect()
    assert(first.forall(r => r.isNullAt(r.fieldIndex("growth"))))
  }

  test("cohort ltv: hand-computed two-cohort triangle accumulates per member") {
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    // cohort Jan: custs 1,2 — Jan revenue 100+200, Feb revenue 50 (cust 1)
    // cohort Feb: cust 3 — Feb revenue 300
    writeOrders(dir, Seq(
      (1L, 1L, 100.0, "2024-01-05"), (2L, 2L, 200.0, "2024-01-20"),
      (3L, 1L, 50.0, "2024-02-10"), (4L, 3L, 300.0, "2024-02-15")))
    val r = RevenueOps.cohortLtv(spark, dir).collect()
      .map(x => (x.getAs[java.sql.Date]("cohort").toString, x.getAs[Long]("age")) ->
        ((x.getAs[Long]("n_customers"), x.getAs[Long]("cum_cents"),
          x.getAs[Double]("ltv_per_user")))).toMap
    assert(r(("2024-01-01", 0L)) == ((2L, 30000L, 15000.0)))
    assert(r(("2024-01-01", 1L)) == ((2L, 35000L, 17500.0)))
    assert(r(("2024-02-01", 0L)) == ((1L, 30000L, 30000.0)))
  }

  test("interarrival: hand-computed gaps, shares sum to 1") {
    val dir = java.nio.file.Files.createTempDirectory("gaps").toString
    // cust 1: days 1, 3, 3, 10 -> gaps 2, 0, 7; cust 2: single order, no gap
    writeOrders(dir, Seq(
      (1L, 1L, 10.0, "2024-01-01"), (2L, 1L, 10.0, "2024-01-03"),
      (3L, 1L, 10.0, "2024-01-03"), (4L, 1L, 10.0, "2024-01-10"),
      (5L, 2L, 10.0, "2024-01-05")))
    val r = RevenueOps.interarrival(spark, dir).collect()
      .map(x => x.getAs[Long]("gap_days") ->
        ((x.getAs[Long]("n_pairs"), x.getAs[Double]("share")))).toMap
    assert(r.keySet == Set(0L, 2L, 7L))
    assert(r(0L)._1 == 1L && r(2L)._1 == 1L && r(7L)._1 == 1L)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("wilson ci: matches the JVM formula, stays in [0,1], brackets p") {
    val rows = RevenueOps.wilsonCi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val n = row.getAs[Long]("n").toDouble
      val p = row.getAs[Long]("successes") / n
      val z = 1.96
      val denom = 1.0 + z * z / n
      val center = p + z * z / (2.0 * n)
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      assert(row.getAs[Double]("ci_lo") == (center - half) / denom)
      assert(row.getAs[Double]("ci_hi") == (center + half) / denom)
      assert(row.getAs[Double]("ci_lo") >= 0.0 && row.getAs[Double]("ci_hi") <= 1.0)
      assert(row.getAs[Double]("ci_lo") <= p && p <= row.getAs[Double]("ci_hi"))
    }
  }

  test("pareto share: planted heavy spender dominates; shares consistent") {
    val dir = java.nio.file.Files.createTempDirectory("pareto").toString
    // 9 small customers at 10.00 each, one whale at 910.00 -> whale is
    // above p80 and holds 91% of revenue
    writeOrders(dir, (1L to 9L).map(i => (i, i, 10.0, "2024-01-05")) :+
      (10L, 10L, 910.0, "2024-01-06"))
    val r = RevenueOps.paretoShare(spark, dir).head()
    assert(r.getAs[Long]("n_customers") == 10L)
    assert(r.getAs[Long]("n_top") == 1L)
    assert(r.getAs[Long]("total_cents") == 100000L)
    assert(r.getAs[Long]("top_cents") == 91000L)
    assert(r.getAs[Double]("top_revenue_share") == 0.91)
  }

  test("decile report: shares sum to 1 and revenue concentrates upward on the fixture") {
    val rows = RevenueOps.decileReport(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("decile")).distinct.length == rows.length)
    assert(math.abs(rows.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-12)
    val shares = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("revenue_share"))
    assert(shares.last > shares.head, "top spend decile out-earns the bottom one")
  }

  test("yoy growth: calendar alignment skips gap months instead of misaligning") {
    val dir = java.nio.file.Files.createTempDirectory("yoy").toString
    // Jan-2023 100, Mar-2023 50 (gap Feb), Jan-2024 150: Jan-2024 aligns
    // to Jan-2023 (+50%); Mar-2023 and Jan-2023 have no baseline
    writeOrders(dir, Seq(
      (1L, 1L, 100.0, "2023-01-10"), (2L, 1L, 50.0, "2023-03-10"),
      (3L, 1L, 150.0, "2024-01-15")))
    // customer table for the nation join
    Seq((1L, "c", 7L, "BUILDING", 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = RevenueOps.yoyGrowth(spark, dir).collect()
    val jan24 = r.find(_.getAs[java.sql.Date]("month").toString == "2024-01-01").get
    assert(jan24.getAs[Long]("prev_year_cents") == 10000L)
    assert(jan24.getAs[Double]("yoy_growth") == 0.5)
    assert(r.count(x => x.isNullAt(x.fieldIndex("prev_year_cents"))) == 2)
  }

  test("cramers v: chi2 matches a JVM mirror; V in [0,1]") {
    val row = RevenueOps.cramersV(spark, sfDir).head()
    val cells = graft.engine.Tables.load(spark, sfDir, "customer")
      .groupBy("c_nationkey", "c_mktsegment").count().collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) -> r.getLong(2)).toMap
    val n = cells.values.sum.toDouble
    val rtot = cells.groupBy(_._1._1).view.mapValues(_.values.sum.toDouble).toMap
    val ctot = cells.groupBy(_._1._2).view.mapValues(_.values.sum.toDouble).toMap
    val chi2 = cells.toSeq.sortBy(_._1).map { case ((r, c), o) =>
      val e = rtot(r) * ctot(c) / n
      (o - e) * (o - e) / e
    }.foldLeft(0.0)(_ + _)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-7)
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(row.getAs[Long]("n_rows") > 1 && row.getAs[Long]("n_cols") > 1)
  }

  test("PSI drift: identical eras score exactly 0, a shifted era scores positive") {
    val stable = (1 to 6).map(i =>
      (i.toLong, i.toLong, 100.0 * (i % 3 + 1),
        if (i <= 3) "1996-01-01" else "1999-01-01"))
    val dirS = java.nio.file.Files.createTempDirectory("psiS").toString
    writeOrders(dirS, stable)
    val s0 = RevenueOps.psiDrift(spark, dirS).collect()
    assert(s0.nonEmpty)
    assert(s0.forall(_.getAs[Double]("psi_bits") == 0.0),
      "identical per-bucket masses must cancel exactly")
    // era A all cheap, era B all expensive -> mass moved across buckets
    val shifted = (1 to 3).map(i => (i.toLong, i.toLong, 100.0, "1996-01-01")) ++
      (4 to 6).map(i => (i.toLong, i.toLong, 900.0, "1999-01-01"))
    val dirD = java.nio.file.Files.createTempDirectory("psiD").toString
    writeOrders(dirD, shifted)
    val s1 = RevenueOps.psiDrift(spark, dirD).collect()
    assert(s1.head.getAs[Double]("psi_bits") > 0.0, "drift must score positive")
  }
}
