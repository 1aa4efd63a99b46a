package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-semantics edge cases the engine depends on (SURVEY §5.2):
  * lenient casts, M/d/yyyy parsing, NVL-after-miss, composite-join
  * fan-out, positional UNION ALL.
  */
class SemanticsSpec extends SparkTestBase {
  import spark.implicits._

  test("lenient casts: garbage to NULL, not error (Spark 3.1 semantics, ansi off)") {
    val df = Seq("N/A", "", "12", "12.7", "$1,234.56").toDF("s")
      .select(
        col("s"),
        col("s").cast(IntegerType).as("i"),
        col("s").cast(DecimalType(10, 2)).as("d"))
    val byS = df.collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(byS("N/A") == (null, null))
    assert(byS("") == (null, null))
    assert(byS("12") == (12, new java.math.BigDecimal("12.00")))
    // cast string->int truncates via decimal in lenient mode
    assert(byS("12.7")._2 == new java.math.BigDecimal("12.70"))
    // currency string is NOT directly castable - that's why the reference
    // strips '$' and ',' first (variables.py:40)
    assert(byS("$1,234.56") == (null, null))
  }

  test("currency cleanup: replace '$'/',' then cast (variables.py:40)") {
    val out = Seq("$90,000", "$1,234.56", "garbage", null)
      .toDF("income")
      .select(expr("cast(replace(replace(income, '$', ''), ',', '') as decimal(10,2))").as("d"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(out.toSeq == Seq(Some("90000.00"), Some("1234.56"), None, None))
  }

  test("M/d/yyyy date round-trip incl. non-zero-padded days (variables.py:27-28)") {
    val out = Seq("1/7/2015", "12/25/2017", "4/8/1966", "not a date", null)
      .toDF("s")
      .select(expr(
        "cast(from_unixtime(unix_timestamp(s, 'M/d/yyyy'), 'yyyy-MM-dd') as date)").as("d"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(out.toSeq == Seq(
      Some("2015-01-07"), Some("2017-12-25"), Some("1966-04-08"), None, None))
  }

  test("NVL after a missed left join defaults, not drops (variables.py:60)") {
    val sales = Seq((1, 10), (2, 20)).toDF("k", "v")
    val returns = Seq((1, 5)).toDF("k", "ret")
    val out = sales.join(returns, Seq("k"), "left_outer")
      .select(col("k"), expr("nvl(ret, 0)").as("ret0"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq == Seq((1, 5), (2, 0)))
  }

  test("composite-key join fan-out multiplies rows (variables.py:79-83)") {
    val a = Seq((1, "x"), (1, "y")).toDF("t", "p") // 2 sales rows, same keys
    val f = Seq((1, "r1"), (1, "r2"), (1, "r3")).toDF("t", "r") // 3 returns
    val joined = a.join(f, Seq("t"), "left_outer")
    assert(joined.count() == 6) // 2 x 3 - fan-out is intended behavior
  }

  test("UNION ALL is positional, not by-name (variables.py:19-24)") {
    val x = Seq((1, "a")).toDF("n", "s")
    val y = Seq((2, "b")).toDF("s", "n") // same positional types, names swapped
    val u = x.union(y) // positional: y's first column lands under x's "n"
    val rows = u.orderBy("n").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a"), (2, "b"))) // unionByName would give (2,"b")->("b",2)
    assert(u.schema.fieldNames.toSeq == Seq("n", "s"))
  }

  test("count(*) validation shape (etl_aws_vini.py:244-256)") {
    val n = operators.RelationalOps.countStar(spark, sfDir)
      .collect()(0).getLong(0)
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(n == raw && n > 0)
  }

  test("approx_percentile stays within rank-error bounds of the exact percentiles") {
    import graft.operators.RelationalOps
    def byGroup(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double)] =
      df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = byGroup(RelationalOps.percentiles(spark, sfDir))
    val approx = byGroup(RelationalOps.approxPercentiles(spark, sfDir))
    assert(approx.keySet == exact.keySet)
    // GK accuracy 1000 => rank error <= 1/1000; on this distribution the
    // value error at p50/p90 stays well inside 5%
    for ((g, (med, p90)) <- exact) {
      val (am, ap) = approx(g)
      assert(math.abs(am - med) / med < 0.05, s"$g median: approx=$am exact=$med")
      assert(math.abs(ap - p90) / p90 < 0.05, s"$g p90: approx=$ap exact=$p90")
    }
  }

  test("CDC apply: deletes gone, updates replaced, inserts present, rest untouched") {
    val before = operators.RelationalOps
      .cdcApply(spark, sfDir).collect()
    val byKey = before.map(r => r.getLong(0) -> r).toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    orders.foreach { case (k, price) =>
      (k % 7) match {
        case 0 => assert(!byKey.contains(k), s"key $k must be deleted")
        case 1 => assert(byKey(k).getDouble(2) == price + 100d, s"key $k updated")
        case 2 =>
          assert(byKey(k).getDouble(2) == price)          // original untouched
          assert(byKey.contains(k + 1000000000L), s"insert for $k present")
        case _ => assert(byKey(k).getDouble(2) == price, s"key $k untouched")
      }
    }
  }

  test("dyadic EWMA: hand-computed weights on a crafted order series") {
    val orders = Seq(
      (1L, 1L, "1995-01-01", 100.0),
      (1L, 2L, "1995-01-02", 200.0),
      (1L, 3L, "1995-01-03", 400.0),
      (2L, 4L, "1995-01-01", 50.0))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = graft.operators.WindowOps.ewmaOf(orders).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // cents 10000/20000/40000; weights current=128, lag1=64, lag2=32;
    // divisor = mass of PRESENT lags only (no zero-padding warm-up bias)
    assert(got(1L) == 100.0, "first order's EWMA is that order's value")
    assert(got(2L) == (20000.0 * 128 + 10000 * 64) / (192 * 100.0))
    assert(got(3L) == (40000.0 * 128 + 20000 * 64 + 10000 * 32) / (224 * 100.0))
    assert(got(4L) == 50.0, "partitions independent")
  }

  test("ratio-to-report: shares sum to 1 per customer") {
    val sums = operators.WindowOps.ratioToReport(spark, sfDir)
      .groupBy("o_custkey").agg(sum("share").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s"share sum $s"))
  }

  test("SCD2: contiguous intervals, one open row per user, change-only versions") {
    val out = operators.WindowOps.scd2(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (user, rs0) =>
      val rs = rs0.sortBy(r => (r.getLong(3), r.getLong(1)))
      assert(rs.count(_.getBoolean(5)) == 1, s"user $user open rows")
      assert(rs.last.getBoolean(5), s"user $user: open row must be last")
      assert(rs.last.isNullAt(4), s"user $user: open row has null valid_to")
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $user: intervals must be contiguous")
          assert(a.getString(2) != b.getString(2),
            s"user $user: consecutive versions must differ")
        case _ => // single-version user
      }
    }
  }

  test("snapshot diff: every status occurs, null-safe column comparison, changed-column lists exact") {
    import spark.implicits._
    import graft.operators.RelationalOps
    val oldSnap = Seq(
      (1L, Some("a"), Some(10.0)),   // unchanged
      (2L, Some("b"), Some(20.0)),   // value -> value change on v
      (3L, Some("c"), None),         // NULL -> value change on d
      (4L, None, None),              // both NULL -> NULL: unchanged
      (5L, Some("e"), Some(50.0)))   // removed
      .toDF("id", "v", "d")
    val newSnap = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("B"), Some(20.0)),
      (3L, Some("c"), Some(30.0)),
      (4L, None: Option[String], None: Option[Double]),
      (6L, Some("f"), Some(60.0)))   // added
      .toDF("id", "v", "d")
    val got = RelationalOps.snapshotDiff(oldSnap, newSnap, "id", Seq("v", "d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "unchanged", ""),
      (2L, "changed", "v"),
      (3L, "changed", "d"),
      (4L, "unchanged", ""),
      (5L, "removed", ""),
      (6L, "added", "")))
    // multi-column change lists every differing column in order
    val multi = RelationalOps.snapshotDiff(
      Seq((9L, Some("x"), Some(1.0))).toDF("id", "v", "d"),
      Seq((9L, Some("y"), Some(2.0))).toDF("id", "v", "d"),
      "id", Seq("v", "d")).collect()
    assert(multi.head.getString(2) == "v,d")
  }
}
