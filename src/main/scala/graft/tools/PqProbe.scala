package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind [[graft.ext.Similarity.pqTopK]]'s
  * shortlist sizing: prints the worst ADC rank of any exact-top-10
  * member per fixture (the shortlist must exceed it for the exact
  * re-rank to reproduce the true top-k). Run after changing m/kSub or
  * regenerating fixtures; /tmp/sf1 requires a prior ScaleGen run.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/tmp/sf1")) {
      val emb = graft.engine.Tables.load(
        graft.engine.GraftSession.tuned(spark), dir, "embeddings")
      val exact = graft.ext.Similarity.bruteForceTopK(emb, 0L, 10)
        .collect().map(_.getLong(0)).toSet
      val n = emb.count().toInt
      val (scores, _, _) = graft.ext.Similarity.pqAdcScores(emb, 0L, m = 8,
        kSub = 32, iters = 3)
      val ranked = scores.orderBy(col("adc").desc, col("vec_id"))
        .collect().map(_.getLong(0)).zipWithIndex.toMap
      val worst = exact.map(ranked(_)).max + 1
      println(s"PQ $dir n=$n worstAdcRankOfTrueTop10=$worst")
    }
    spark.stop()
  }
}
