package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table loading, mirroring the reference's view registry
  * (k8s/codes/transformation.py:30-37 registers each parquet directory
  * under a bare name from k8s/codes/variables.py:5-14).
  *
  * Here the catalog is the driver testdata directory: one parquet file
  * per table stem. Loaders are plain `spark.read.parquet` so Catalyst
  * keeps full pushdown/pruning freedom — no caching, no materialization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): surfaced as nanos-since-epoch
    // long (GraftSession sets nanosAsLong), truncated here to micros —
    // exactly what DuckDB does reading the same file into TIMESTAMP.
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every testdata table as a temp view (reference pattern:
    * createOrReplaceTempView per table, then SQL against bare names).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
