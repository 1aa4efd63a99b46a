package graft

import org.apache.spark.sql.functions._

/** The D3/D4 guard semantics on REAL degenerate inputs: every guarded
  * statistic must return NULL (the "undefined here" signal both
  * engines share after the r11 nullif/greatest guards), never
  * NaN/Infinity — with ANSI off Spark's raw x/0 is NULL but raw
  * 0.0/0.0-via-literal-folding, sqrt(negative) and log(0) paths can
  * still produce NaN, and DuckDB diverges (NaN) or dies (sqrt/log)
  * without the shared guards. OverflowAuditSpec proves the guards
  * exist structurally; this spec proves what they DO.
  */
class DegenerateInputsSpec extends SparkTestBase {
  import spark.implicits._

  /** Write minimal degenerate tables into a temp dir shaped like a
    * testdata SF dir, so the (session, dir) query builders run on it.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-degen").toString
    // lineitem: group "C" is CONSTANT in quantity and linenumber and
    // price; group "S" has a single row — both zero every variance-
    // family denominator
    Seq(
      ("C", 5L, 1L, 100.0), ("C", 5L, 1L, 100.0), ("C", 5L, 1L, 100.0),
      ("S", 7L, 2L, 250.0))
      .toDF("l_returnflag", "l_quantity", "l_linenumber", "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")
    // customer: ONE market segment (single-category contingency table)
    Seq((1L, 0L, "ONLY"), (2L, 1L, "ONLY"), (3L, 0L, "ONLY"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    // orders: constant daily revenue (zero autocovariance denominator)
    Seq((1L, 1L, "1995-01-01", 10.0), (2L, 1L, "1995-01-02", 10.0),
      (3L, 1L, "1995-01-03", 10.0), (4L, 1L, "1995-01-04", 10.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.parquet(s"$d/orders.parquet")
    d
  }

  private def one(df: org.apache.spark.sql.DataFrame, where: String) =
    df.where(where).head()

  test("statsAgg: a single-row group's stddev is NULL, a constant group's is 0") {
    val r = graft.operators.RelationalOps.statsAgg(spark, dir)
    assert(one(r, "l_returnflag = 'S'").isNullAt(
      r.columns.indexOf("stddev_q")), "n = 1: stddev undefined -> NULL")
    assert(one(r, "l_returnflag = 'C'")
      .getDouble(r.columns.indexOf("stddev_q")) == 0.0,
      "constant group: stddev exactly 0, not NaN")
  }

  test("corrCovar: constant x zeroes the variance term -> corr NULL, covar defined") {
    val r = graft.operators.RelationalOps.corrCovar(spark, dir)
    for (flag <- Seq("C", "S")) {
      val row = one(r, s"l_returnflag = '$flag'")
      assert(row.isNullAt(r.columns.indexOf("corr_xy")),
        s"$flag: zero variance -> corr NULL, never NaN")
      assert(!row.getDouble(r.columns.indexOf("covar_pop")).isNaN)
    }
  }

  test("linReg: constant x -> slope/intercept/r2 all NULL") {
    val r = graft.operators.RelationalOps.linReg(spark, dir)
    for (flag <- Seq("C", "S"); c <- Seq("slope", "intercept", "r2"))
      assert(one(r, s"l_returnflag = '$flag'")
        .isNullAt(r.columns.indexOf(c)), s"$flag.$c")
  }

  test("skewKurt: zero variance -> skew/kurt NULL, never NaN") {
    val r = graft.operators.RelationalOps.skewKurt(spark, dir)
    for (flag <- Seq("C", "S"); c <- Seq("skew_pop", "kurt_excess"))
      assert(one(r, s"l_returnflag = '$flag'")
        .isNullAt(r.columns.indexOf(c)), s"$flag.$c")
  }

  test("cramersV: a single-category table -> V NULL (chi2 still 0)") {
    val r = graft.ext.RevenueOps.cramersV(spark, dir)
    val row = r.head()
    assert(row.getLong(r.columns.indexOf("n_cols")) == 1L)
    assert(row.isNullAt(r.columns.indexOf("cramers_v")),
      "min(r,c) - 1 = 0 -> V undefined -> NULL")
  }

  test("acf + ljungBox: an all-constant daily series -> NULL statistics") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val a = graft.ext.TimeSeries.acf(orders)
    assert(a.count() > 0)
    a.collect().foreach(row =>
      assert(row.isNullAt(a.columns.indexOf("acf")),
        "zero denominator (constant series) -> acf NULL"))
    val lb = graft.ext.TimeSeries.ljungBox(orders)
    val row = lb.head()
    assert(row.isNullAt(lb.columns.indexOf("q_stat")),
      "Q over NULL terms is NULL, never NaN")
  }

  test("no NaN or Infinity leaks from any guarded column") {
    // belt and braces over every double column of the guarded keys
    val frames = Seq(
      graft.operators.RelationalOps.statsAgg(spark, dir),
      graft.operators.RelationalOps.corrCovar(spark, dir),
      graft.operators.RelationalOps.linReg(spark, dir),
      graft.operators.RelationalOps.skewKurt(spark, dir),
      graft.ext.RevenueOps.cramersV(spark, dir))
    frames.foreach { df =>
      df.collect().foreach { row =>
        df.schema.fields.zipWithIndex.foreach {
          case (f, i) if f.dataType ==
              org.apache.spark.sql.types.DoubleType && !row.isNullAt(i) =>
            val v = row.getDouble(i)
            assert(!v.isNaN && !v.isInfinity,
              s"${f.name} leaked $v on degenerate input")
          case _ => ()
        }
      }
    }
  }
}
