package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: where does q_pagerank_docs spend time at decade SFs —
  * the containment edge build or the rank loop? */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.GraftSession.tuned(spark)
    for (dir <- args) {
      def t[T](l: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[pr] $dir $l ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
      }
      val docs = graft.engine.Tables.load(spark, dir, "documents")
      val edges = t("edges build+checkpoint") {
        graft.ext.Dedup.containmentJoin(docs, "text", "doc_id", sorted = false)
          .select(col("sup_id").as("src"), col("sub_id").as("dst"), lit(1L).as("w"))
          .localCheckpoint()
      }
      println(s"[pr] $dir n_edges ${edges.count()}")
      val nodes = docs.select(col("doc_id").as("node")).distinct()
      t("rank loop") {
        graft.ext.GraphOps.pageRankOnGraph(edges, nodes, 3)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
