package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Dev tool: measure ANN recall@10 vs exact top-k across parameter
  * settings on the sf0.01 fixture (run via
  * `sbt "runMain graft.tools.AnnTune <sfDir>"`).
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.engine.Tables.load(
      graft.engine.GraftSession.tuned(spark), dir, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (radius <- Seq(1, 2, 3)) {
      val got = Similarity.lshTopK(emb, 0L, 10, probeRadius = radius)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"LSH radius=$radius recall@10=${(got & exact).size / 10.0}")
    }
    for (iters <- Seq(0, 3); nProbe <- Seq(4, 6, 8)) {
      val got = Similarity.ivfTopK(emb, 0L, 10, nProbe = nProbe, kmeansIters = iters)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"IVF kmeansIters=$iters nProbe=$nProbe recall@10=${(got & exact).size / 10.0}")
    }
    spark.stop()
  }
}
