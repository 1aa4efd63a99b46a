package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}
import graft.ext.Dedup

/** Dev-only stage profiler for the MinHash pipeline (not part of the
  * library surface; invoked manually while tuning).
  */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(GraftSession.tuned(spark), sfDir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[debug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val shingled = Dedup.hashedShingleSets(docs, "text", "doc_id", 2)
    time("shingle hashes")(shingled.count())
    val signed = shingled.withColumn("sig", expr("graft_minhash_sig(shs, 16)")).drop("shs")
    time("signatures")(signed.count())
    val bands = Dedup.lshBands(signed, "doc_id", 4, 4)
    time("bands")(bands.count())
    val bandsNoEst = {
      val l = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id1"))
      val r = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id2"))
      l.join(r, Seq("band_id", "band_hash")).where(col("id1") < col("id2"))
    }
    time("raw bucket pairs")(bandsNoEst.count())
    val cand = Dedup.candidatePairs(bands, "doc_id", 16, 0.2)
    time("cand pairs (est+distinct)")(cand.count())
    time("full pipeline")(Dedup.minhashNearDupPairs(docs, "text", "doc_id").count())
    spark.stop()
  }
}
