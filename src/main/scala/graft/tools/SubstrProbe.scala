package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}

/** Stage attribution for q_substring_dup_spans (the slowest sf0.1 key,
  * 7.6 s in the r9 artifact): times the gram explode, the frequency
  * census, the dup-position join-back, and the full key in one JVM so
  * the deltas attribute the wall-clock (the GopherGramProbe
  * discipline).
  *
  * Usage: runMain graft.tools.SubstrProbe [sfDir] [rounds]
  */
object SubstrProbe {
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

    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[substr] $label%-22s $sec%7.2f s")
      sec
    }

    val grams = docs
      .where(length(col("text")) >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - L + 1)).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.functions.HashExprs.md5Uint60(
          expr(s"substring(text, pos, $L)")).as("gram"))

    val gramsXx = docs
      .where(length(col("text")) >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - L + 1)).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(expr(s"substring(text, pos, $L)")).as("gram"))

    (1 to rounds).foreach { r =>
      println(s"[substr] ---- round $r ----")
      timed("explode+md5")(grams)
      timed("explode+xxh64")(gramsXx)
      timed("census-xxh64")(gramsXx.groupBy("gram").agg(count(lit(1)).as("gram_df")))
      timed("census")(grams.groupBy("gram").agg(count(lit(1)).as("gram_df")))
      val df = grams.groupBy("gram").agg(count(lit(1)).as("gram_df"))
      timed("dupPos SMJ")(grams
        .join(df.where(col("gram_df") >= 2).hint("merge"), Seq("gram"))
        .select("doc_id", "pos"))
      timed("dupPos SHJ")(grams
        .join(df.where(col("gram_df") >= 2).hint("shuffle_hash"), Seq("gram"))
        .select("doc_id", "pos"))
      timed("full key")(graft.Catalog.byName("q_substring_dup_spans")
        .build(spark, sfDir))
    }
    spark.stop()
  }
}
