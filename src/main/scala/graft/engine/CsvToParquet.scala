package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1+S3: the reference's per-table CSV→Parquet conversion job
  * (k8s/codes/csv-to-parquet.py:37-46), run once per landing file.
  *
  * Semantics preserved exactly: `sep=","`, `header=True`, UTF-8, and NO
  * schema inference — every column lands as StringType, which is what
  * makes the curated query's lenient casts load-bearing. The write is
  * `coalesce(1).mode("overwrite")` single-file parquet, as in the
  * reference (fixture-scale semantics; see [[graft.ext]] scale notes —
  * a 100 TB path would `repartition` by size instead).
  */
object CsvToParquet {

  /** All-string CSV read with the reference's exact options. */
  def readCsvAllString(spark: SparkSession, path: String): DataFrame =
    GraftSession.tuned(spark).read
      .format("csv")
      .option("sep", ",")
      .option("header", true)
      .option("encoding", "UTF-8")
      .load(path)

  /** One conversion step: CSV in, single-file parquet out. */
  def run(spark: SparkSession, source: String, target: String): Unit =
    readCsvAllString(spark, source)
      .coalesce(1)
      .write.mode("overwrite")
      .format("parquet")
      .save(target)
}
