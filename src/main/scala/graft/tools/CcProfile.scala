package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the near-dup label pipeline (the cost
  * behind q_minhash_neardup / q_dedup_clusters / q_dedup_apply):
  * splits shingle-set construction, candidate generation, exact
  * verify, and connected components into separately-timed actions on
  * a given fixture dir. A warmup action runs first so the first
  * stage's number is not dominated by session/codegen start-up —
  * position effects are real (an identical stage measured 4.0 s
  * first-in-session vs 2.5 s warm), so compare stages within one run,
  * and A/B variants only in separate runs at the same position.
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.engine.GraftSession.tuned(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup (count + one regex pass)") {
      println("[ccprofile] n_docs = " + docs
        .where(length(regexp_replace(col("text"), "z", "z")) >= 0).count())
    }
    println("[ccprofile] scan partitions = " + docs.rdd.getNumPartitions)
    time("normalize only") {
      println("[ccprofile] normlen = " + docs
        .select(sum(length(graft.functions.TextOps.normalizeText(col("text")))))
        .collect()(0).getLong(0))
    }
    val sets = time("shingle sets (hash + persist + count)") {
      val x = graft.ext.Dedup.hashedShingleSets(docs, "text", "doc_id", 2)
        .persist()
      println(s"[ccprofile] n_sets = ${x.count()} parts = ${x.rdd.getNumPartitions}")
      x
    }
    val cand = time("signatures + bands + bucket join + distinct") {
      val signed = sets.withColumn("sig", expr("graft_minhash_sig(shs, 16)"))
      val c = graft.ext.Dedup.candidatePairs(
        graft.ext.Dedup.lshBands(signed.drop("shs"), "doc_id", 8, 2),
        "doc_id", 16, minEstJaccard = 0.3).persist()
      println(s"[ccprofile] n_cand = ${c.count()}")
      c
    }
    val pairs = time("exact verify join") {
      val p = cand
        .join(sets.withColumnRenamed("doc_id", "id1").withColumnRenamed("shs", "sh1"), "id1")
        .join(sets.withColumnRenamed("doc_id", "id2").withColumnRenamed("shs", "sh2"), "id2")
        .select(col("id1"), col("id2"),
          (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            size(array_union(col("sh1"), col("sh2"))).cast("double")).as("j"))
        .where(col("j") >= 0.5)
        .select("id1", "id2").persist()
      println(s"[ccprofile] n_pairs = ${p.count()}")
      p
    }
    time("connectedComponents") {
      println(s"[ccprofile] n_labeled = ${graft.ext.Dedup.connectedComponents(pairs).count()}")
    }
    spark.stop()
  }
}
