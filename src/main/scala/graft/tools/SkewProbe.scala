package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose the skew fixture's near-dup cost — candidate
  * volume, verified-pair volume, cluster structure, stage timings. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1skew"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.load(
      graft.engine.GraftSession.tuned(spark), dir, "documents")
    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skewprobe] $n: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val pairs = timed("pairs build+count") {
      val p = graft.ext.Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        threshold = 0.5, sorted = false)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[skewprobe] verified pairs: ${p.count()}")
      p
    }
    // the pipeline's designed mitigation: line-grain dedup BEFORE
    // near-dup strips the corpus-wide boilerplate, collapsing the
    // adversarial near-clique back to organic pair volume
    timed("lineDedup -> pairs") {
      val cleaned = graft.ext.Dedup.lineDedup(docs)
        .select(col("doc_id"), col("new_text").as("text"))
      val p2 = graft.ext.Dedup.minhashNearDupPairs(cleaned, "text", "doc_id",
        threshold = 0.5, sorted = false)
      println(s"[skewprobe] post-lineDedup verified pairs: ${p2.count()}")
    }
    timed("cc") {
      val labels = graft.ext.Dedup.connectedComponents(
        pairs.select("id1", "id2"))
      val comps = labels.groupBy("comp").agg(count(lit(1)).as("n"))
      println("[skewprobe] top clusters:")
      comps.orderBy(col("n").desc).limit(5).collect()
        .foreach(r => println(s"  comp=${r.get(0)} size=${r.getLong(1)}"))
      println(s"[skewprobe] clustered docs: ${labels.count()}")
    }
    spark.stop()
  }
}
