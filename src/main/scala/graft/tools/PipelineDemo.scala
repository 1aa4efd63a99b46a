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
    // default run, then the composition with the optional cleaning
    // stages on (RefinedWeb line cleaning + CDC chunk dedup). The
    // Gopher batteries are left OFF here deliberately: the synthetic
    // fixture corpus is not English prose (no stopwords, tiny vocab,
    // heavy repetition) and legitimately fails both batteries
    // wholesale — a verified 5000→0 kill, demonstrated instead by the
    // planted-kill spec and the oracle-gated battery keys.
    val t0 = System.nanoTime()
    val r = graft.ext.TrainingPipeline.run(docs, s"$outDir/default")
    val s0 = (System.nanoTime() - t0) / 1e9
    println(f"[pipeline] default: $r in $s0%.1f s")
    val t1 = System.nanoTime()
    val rFull = graft.ext.TrainingPipeline.run(docs, s"$outDir/full",
      graft.ext.TrainingPipeline.Config(lineClean = true,
        chunkDupMaxFrac = Some(0.6)))
    val s1 = (System.nanoTime() - t1) / 1e9
    println(f"[pipeline] +lineclean+chunkdedup: $rFull in $s1%.1f s")
    spark.stop()
  }
}
