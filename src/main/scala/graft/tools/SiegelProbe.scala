package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.engine.{GraftSession, Tables}
import graft.ext.TimeSeries

/** Dev harness: stage-by-stage timing of the Siegel repeated-median
  * estimator at a given SF dir — not part of the shipped surface.
  */
object SiegelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val orders = Tables.load(spark, dir, "orders")
    time("warmup count")(orders.count())
    val xy = time("dailyRevenue ckpt")(TimeSeries.dailyRevenue(orders)
      .select(datediff(col("day"), lit("1992-01-01").cast("date"))
        .cast("long").as("x"), col("cents").as("y"))
      .localCheckpoint())
    println(s"[probe] days = ${xy.count()}  partitions = ${xy.rdd.getNumPartitions}")
    val series = time("series collect_list")(
      xy.agg(collect_list(struct(col("x"), col("y"))).as("pts")))
    val perPoint = xy.select(col("x").as("ax"), col("y").as("ay"))
      .crossJoin(broadcast(series))
      .select(expr(
        """sort_array(transform(filter(pts, p -> p.x <> ax),
          |  p -> CAST(p.y - ay AS DOUBLE) / CAST(p.x - ax AS DOUBLE)))"""
          .stripMargin).as("sl"))
      .select(expr(
        """CASE WHEN size(sl) = 0 THEN NULL
          |     WHEN size(sl) % 2 = 1
          |       THEN element_at(sl, CAST(size(sl) div 2 + 1 AS INT))
          |     ELSE element_at(sl, CAST(size(sl) div 2 AS INT)) +
          |          (element_at(sl, CAST(size(sl) div 2 + 1 AS INT)) -
          |           element_at(sl, CAST(size(sl) div 2 AS INT))) * 0.5D END"""
          .stripMargin)
        .cast(DecimalType(18, 6)).cast(DoubleType).as("ms"))
    val m = time("perPoint medians + outer")(
      perPoint.agg(count(lit(1)).as("n_points"),
        expr("percentile(ms, 0.5)").cast(DecimalType(18, 6))
          .cast(DoubleType).as("slope_cpd")).head())
    println(s"[probe] $m")
    val slope = m.getDouble(1)
    time("residual median")(
      xy.select((col("y") - lit(slope) * col("x")).as("r"))
        .agg(expr("percentile(r, 0.5)")).head())
    time("full registered fn")(
      TimeSeries.siegelTrend(orders).collect())
    // ---- theilSen breakdown ----
    val slopes = xy.select(col("x").as("x1"), col("y").as("y1"))
      .join(broadcast(xy.select(col("x").as("x2"), col("y").as("y2"))),
        col("x1") < col("x2"))
      .select(((col("y2") - col("y1")).cast(DoubleType) /
        (col("x2") - col("x1")).cast(DoubleType)).as("slope"))
    time("ts: slope gen count")(println("[probe] n_slopes = " + slopes.count()))
    time("ts: percentile median")(println("[probe] med = " +
      slopes.agg(expr("percentile(slope, 0.5)")).head()))
    time("ts: sort+zip median")({
      import spark.implicits._
      val rdd = slopes.select(col("slope")).as[Double].rdd
      val n = rdd.count()
      val lo = (n - 1) / 2; val hi = n / 2
      val picks = rdd.sortBy(identity).zipWithIndex().map(_.swap)
        .filter { case (i, _) => i == lo || i == hi }
        .values.collect().sorted
      println("[probe] med2 = " + (picks(0) + (picks(picks.length - 1) - picks(0)) * 0.5))
    })
    time("ts: df-sort+zip median")({
      val n = slopes.count()
      val lo = (n - 1) / 2; val hi = n / 2
      val picks = slopes.orderBy("slope").select("slope").rdd
        .zipWithIndex().filter { case (_, i) => i == lo || i == hi }
        .map(_._1.getDouble(0)).collect().sorted
      println("[probe] med3 = " + (picks(0) + (picks(picks.length - 1) - picks(0)) * 0.5))
    })
    time("full theilSen")(TimeSeries.theilSen(orders).collect())
    spark.stop()
  }
}
