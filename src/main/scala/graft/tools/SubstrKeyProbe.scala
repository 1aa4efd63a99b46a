package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}

/** Same-window A/B for the exact-substring duplicated-position build
  * (the surface's most expensive key family): gram-key width (60-bit
  * long vs full 128-bit binary md5 vs 128-bit as two longs) × exchange
  * sharing (census + probe on their own shuffles vs one explicit
  * repartition feeding both). Records the r12 adjudication of the
  * verdict's item 3 (single-exchange shape) alongside the 128-bit
  * safety switch (item 4).
  *
  * Usage: runMain graft.tools.SubstrKeyProbe [sfDir] [rounds]
  */
object SubstrKeyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tuned(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    val L = 30

    def timed(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"[substrkey] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    def gramsWith(key: org.apache.spark.sql.Column, extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
      docs.where(length(col("text")) >= L)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")) - L + 1)).as("pos"))
        .select(Seq(col("doc_id"), col("pos").cast("long").as("pos"), key.as("gram")) ++ extra: _*)

    // owner census + df>=2 probe join over a gram relation; `shared`
    // feeds both subtrees from one explicit gram-keyed repartition
    def dupPos(grams: DataFrame, shared: Boolean): DataFrame = {
      val g = if (shared) grams.repartition(col("gram")) else grams
      val owners = g.groupBy("gram")
        .agg(count(lit(1)).as("gram_df"),
          min(struct(col("doc_id"), col("pos"))).as("own"))
      g.join(owners.where(col("gram_df") >= 2).hint("merge"), Seq("gram"))
        .select(col("doc_id"), col("pos"),
          (col("own.doc_id") === col("doc_id") &&
            col("own.pos") === col("pos")).as("is_first"))
    }

    val k60 = graft.functions.HashExprs.md5Uint60(expr(s"substring(text, pos, $L)"))
    val k128 = unhex(md5(expr(s"substring(text, pos, $L)")))
    val m = md5(expr(s"substring(text, pos, $L)"))
    // 128 bits as two longs: same collision safety, primitive sort keys
    val h1 = conv(substring(m, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(m, 17, 15), 16, 10).cast("long")

    (1 to rounds).foreach { r =>
      println(s"[substrkey] ---- round $r ----")
      timed("dupPos 60bit  own-shuffles")(dupPos(gramsWith(k60), shared = false))
      timed("dupPos 128bin own-shuffles")(dupPos(gramsWith(k128), shared = false))
      timed("dupPos 128bin one-exchange")(dupPos(gramsWith(k128), shared = true))
      timed("dupPos 60bit  one-exchange")(dupPos(gramsWith(k60), shared = true))
      val g2 = docs.where(length(col("text")) >= L)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")) - L + 1)).as("pos"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          struct(h1.as("h1"), h2.as("h2")).as("gram"))
      timed("dupPos 2xlong own-shuffles")(dupPos(g2, shared = false))
      timed("dupPos 2xlong one-exchange")(dupPos(g2, shared = true))
    }
    spark.stop()
  }
}
