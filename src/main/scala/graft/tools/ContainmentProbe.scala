package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.TextOps

/** Dev probe for the containment join's candidate mass at decade SFs:
  * prints, per fixture dir, the shingle-df tail (Σ df and Σ df² of the
  * prefix×token join mass) and the candidate/verified pair counts —
  * the quantities that decide whether the sf10 super-linearity is
  * candidate blow-up (cross-replica shared shingles) or engine/spill.
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf5", "/tmp/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val docs = graft.engine.Tables.load(
        graft.engine.GraftSession.tuned(spark), dir, "documents")
      val sets = Dedup.hashedShingleSets(docs, "text", "doc_id", 3)
      val tok = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
      val df = tok.groupBy("sh").agg(count(lit(1)).as("df"))
      val stats = df.agg(
        count(lit(1)).as("n_shingle_types"),
        sum(col("df")).as("n_tokens"),
        sum(col("df").cast("decimal(38,0)") * col("df")).as("sum_df2"),
        max(col("df")).as("max_df"),
        sum(when(col("df") > 10000, 1L).otherwise(0L)).as("n_hot"),
        sum(when(col("df") > 1000 && col("df") <= 10000, 1L).otherwise(0L))
          .as("n_1k_10k"),
        sum(when(col("df") > 1000 && col("df") <= 10000,
          col("df").cast("decimal(38,0)") * col("df")).otherwise(lit(0)))
          .as("sum_df2_1k_10k")).head()
      println(s"[probe] $dir shingle stats: $stats")
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $dir $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        r
      }
      timed("tok count")(tok.count())
      timed("df census count")(df.count())
      val cands = Dedup.containmentJoin(docs, "text", "doc_id",
        sorted = false)
      val n = timed("full containment join")(cands.count())
      println(s"[probe] $dir verified pairs: $n")
    }
    spark.stop()
  }
}
