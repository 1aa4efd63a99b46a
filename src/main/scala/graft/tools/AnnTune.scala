package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Dev tool: measure ANN recall@10 vs exact top-k across parameter
  * settings on the sf0.01 fixture (run via
  * `sbt "runMain graft.tools.AnnTune <sfDir>"`).
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val emb = graft.engine.Tables.load(
        graft.engine.GraftSession.tuned(spark), dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb, 0L, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (radius <- Seq(1, 2, 3)) {
        val got = Similarity.lshTopK(emb, 0L, 10, probeRadius = radius)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"$dir LSH radius=$radius recall@10=${(got & exact).size / 10.0}")
      }
      for (iters <- Seq(0, 3); nProbe <- Seq(4, 6, 8, 10)) {
        val got = Similarity.ivfTopK(emb, 0L, 10, nProbe = nProbe, kmeansIters = iters)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"$dir IVF kmeansIters=$iters nProbe=$nProbe recall@10=${(got & exact).size / 10.0}")
      }
    }
    spark.stop()
  }
}
