package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Dev tool: assert q_minhash_neardup's pipeline == brute-force exact
  * O(n²) pair list at every fixture SF (the driver's DuckDB oracle only
  * runs at sf0.01; this checks the same equality with Spark's
  * parallelism where DuckDB's single-threaded O(n²) is too slow), and
  * print the similarity margin around the threshold.
  */
object NearDupCheck {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val threshold = 0.5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var ok = true
    for (dir <- dirs) {
      val docs = graft.engine.Tables.load(
        graft.engine.GraftSession.tuned(spark), dir, "documents")
      val pipeline = Dedup.minhashNearDupPairs(docs, "text", "doc_id", threshold = threshold)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = Dedup.shingleSets(docs, "text", 2).select(col("doc_id"), col("shingles"))
      val a = sets.select(col("doc_id").as("id1"), col("shingles").as("sh1"))
      val b = sets.select(col("doc_id").as("id2"), col("shingles").as("sh2"))
      // persist: the O(n²) join feeds two actions (margin agg + pair
      // collect) and is the dominant cost at sf0.1
      val scored = a.join(b, col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            greatest(size(array_union(col("sh1"), col("sh2"))), lit(1)).cast("double")).as("j"))
        .persist()
      val margin = scored.agg(
        max(when(col("j") < threshold, col("j"))).as("max_below"),
        min(when(col("j") >= threshold, col("j"))).as("min_above")).head()
      val brute = scored.where(col("j") >= threshold)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      scored.unpersist()
      val missing = brute -- pipeline
      val extra = pipeline -- brute
      val pass = missing.isEmpty && extra.isEmpty
      ok &= pass
      println(s"$dir pairs=${brute.size} margin=[${margin.get(0)}, ${margin.get(1)}] " +
        s"missing=${missing.size} extra=${extra.size} ${if (pass) "PASS" else s"FAIL missing=$missing extra=$extra"}")
    }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
