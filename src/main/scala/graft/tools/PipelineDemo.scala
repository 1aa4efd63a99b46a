package graft.tools

import org.apache.spark.sql.functions.col

/** Dev tool: run the end-to-end TrainingPipeline against a testdata SF
  * dir and print the stage report + wall time. Usage:
  * runMain graft.tools.PipelineDemo /root/testdata/sf0.1 /tmp/pipe_out
  *
  * Runs a cumulative VARIANT SERIES so each optional stage's
  * incremental cost is attributable by differencing consecutive lines
  * (the r10 verdict's all-stages decade measurement):
  *
  *   default           stages 1-8 (redact, gate, z-cut, exact dedup,
  *                     near-dup keep-one, sample, split, pack, write)
  *   +url              stage 0 crawl dedup on the planted refetch URL
  *   +lineclean        stage 1.5 RefinedWeb line corrections
  *   +chunkdedup       stage 3.5 CDC duplicated-chunk byte-fraction cut
  *   +gopher           stage 2.5 BOTH Gopher A1.1 batteries
  *   all               every optional stage on
  *
  * The Gopher batteries verifiably kill the whole synthetic fixture
  * corpus (it is not English prose: no stopwords, tiny vocab, heavy
  * repetition — a measured 5000→0), so the +gopher and all variants
  * time the batteries' own cost over the full surviving corpus while
  * their downstream stages run on (cheap) empty inputs; the
  * planted-kill spec and the oracle-gated battery keys own the
  * correctness story.
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
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // stage 0 consumes a URL column; the fixture's planted refetch
    // population (the same generator q_url_dedup gates) supplies it
    val docsWithUrl = docs.withColumn("url", graft.ext.WebOps.refetchUrl)
    import graft.ext.TrainingPipeline.{run, Config}
    // timings run with reportCounts = false (the production setting):
    // the per-stage count jobs re-execute the un-persisted plan PREFIX
    // once per counted stage, which at all-stages-on multiplies the
    // expensive gopher battery by the count-job count (measured 77 s
    // vs 24 s at sf0.01) — diagnostic cost, not pipeline cost. Stage
    // attribution comes from differencing the variant lines instead.
    val variants: Seq[(String, Config, Boolean)] = Seq(
      ("default", Config(reportCounts = false), false),
      ("+url", Config(urlDedupCol = Some("url"),
        reportCounts = false), true),
      ("+lineclean", Config(lineClean = true, reportCounts = false), false),
      ("+chunkdedup", Config(chunkDupMaxFrac = Some(0.6),
        reportCounts = false), false),
      ("+gopher", Config(gopherQuality = true, reportCounts = false), false),
      ("all", Config(urlDedupCol = Some("url"), lineClean = true,
        chunkDupMaxFrac = Some(0.6), gopherQuality = true,
        reportCounts = false), true))
    // SPARK_GRAFT_PIPE_ONLY=+gopher,all reruns a subset (A/B probes)
    val only = sys.env.get("SPARK_GRAFT_PIPE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    variants.filter(v => only.forall(_.contains(v._1)))
      .foreach { case (name, cfg, needsUrl) =>
      val in = if (needsUrl) docsWithUrl else docs
      val t0 = System.nanoTime()
      val r = run(in, s"$outDir/$name", cfg)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pipeline] $name%-12s $s%7.1f s  $r")
    }
    spark.stop()
  }
}
