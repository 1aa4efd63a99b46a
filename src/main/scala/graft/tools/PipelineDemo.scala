package graft.tools

/** Dev tool: run the end-to-end TrainingPipeline against a testdata SF
  * dir and print the stage report + wall time. Usage:
  * runMain graft.tools.PipelineDemo /root/testdata/sf0.1 /tmp/pipe_out
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val r = graft.ext.TrainingPipeline.run(docs, outDir)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[pipeline] $r in $secs%.1f s")
    spark.stop()
  }
}
