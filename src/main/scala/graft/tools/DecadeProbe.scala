package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for decade-scaling ratios on a steal-noisy box: for each
  * key, run dirA then dirB IMMEDIATELY AFTER EACH OTHER in the same
  * JVM/session, so the pair shares one contention window and the ratio
  * is attribution-controlled even when absolute seconds wobble 3–4×
  * between minutes (the r8/r9 host-steal signature). One warmup action
  * per dir primes the scans before any timed pair.
  *
  * Usage: runMain graft.tools.DecadeProbe dirA dirB q_key1 q_key2 ...
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val Array(dirA, dirB, keys @ _*) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.GraftSession.tuned(spark)
    def timeKey(key: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.Catalog.byName(key).build(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (d <- Seq(dirA, dirB))
      graft.engine.Tables.load(spark, d, "documents").count()
    println(f"[decade] ${"key"}%-24s ${dirA}%10s ${dirB}%10s ratio")
    keys.foreach { k =>
      val a = timeKey(k, dirA)
      val b = timeKey(k, dirB)
      println(f"[decade] $k%-24s $a%10.1f $b%10.1f ${b / a}%5.2f")
    }
    spark.stop()
  }
}
