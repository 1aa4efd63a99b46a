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
    val sfDir = args(0)
    val outDir = args(1)
    val streamMode = args.length > 2 && args(2) == "stream"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (streamMode) { streamDemo(spark, sfDir, outDir); spark.stop(); return }
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

  /** `stream` mode (3rd arg): measured micro-batch ingest rate against
    * the standing corpus — the BASELINE row for the streaming
    * composition (r11 verdict item 8). Each of three micro-batches is
    * ~10% of the corpus (sf1 standing → sf0.1-scale arrivals): half
    * exact content-dups of standing docs under NEW ids and URLs (only
    * content state can kill them — the absorbed-fingerprint path) and
    * half novel (alphabet-rotated text; the rotation varies per batch
    * so batches don't duplicate each other). Prints per-batch wall,
    * docs/s, and cumulative survivors; expected survivor mass is the
    * novel half of each batch, minus its near-dup casualties.
    */
  private def streamDemo(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", graft.ext.WebOps.refetchUrl)
    val span = corpus.agg(max("doc_id")).head().getLong(0) + 1L
    val in = s"$outDir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val q = graft.ext.TrainingPipeline.streamingIngest(
      corpus, in, s"$outDir/out", s"$outDir/ckpt",
      graft.ext.TrainingPipeline.Config(urlDedupCol = Some("url")))
    val abc = "abcdefghijklmnopqrstuvwxyz"
    // ambient-load evidence per batch, same fields as the batch bench
    // rows (the r12 verdict's item 9: make the streaming throughput a
    // TRACKED number — a rate regression must be distinguishable from
    // a contended window)
    var (load1Prev, iowaitPrev, stealPrev, jiffiesPrev) = graft.Bench.loadSnapshot()
    try {
      var prevOut = 0L
      (1 to 3).foreach { b =>
        // novelty transform must be affine a=25 (reversed alphabet):
        // the ScaleGen fixture's replicas are Caesar rotations (a=1),
        // so a Caesar-shifted "novel" doc would byte-match another
        // replica's copy of the same base doc and die as an exact dup
        val rev = abc.reverse
        val rot = rev.drop(b * 3) + rev.take(b * 3)
        val arriving = corpus
          // slice residue (b-1) mod 10; the dup/novel split keys on
          // mod 20 so it halves WITHIN the slice (mod 2 would correlate
          // with the mod-10 residue and make whole batches one-sided)
          .where(pmod(col("doc_id"), lit(10)) === lit((b - 1).toLong))
          .select(
            (col("doc_id") + lit(span * b)).as("doc_id"),
            when(pmod(col("doc_id"), lit(20)) === lit((b - 1).toLong),
              col("text"))
              .otherwise(translate(col("text"), abc, rot)).as("text"),
            col("lang"), col("source"),
            length(col("text")).cast("long").as("n_chars"),
            concat(lit(s"https://arrivals.example.com/b$b/"),
              col("doc_id").cast("string")).as("url"))
          .select(corpus.columns.map(col): _*)
        val bn = arriving.count()
        // stage then atomically move the part files into the watched dir
        val stage = s"$outDir/stage_$b"
        arriving.write.parquet(stage)
        new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).zipWithIndex
          .foreach { case (f, i) =>
            java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(in, s"b${b}_$i.parquet"),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val s = (System.nanoTime() - t0) / 1e9
        val outN = spark.read.parquet(s"$outDir/out").count()
        val (load1, iowait, steal, jiffies) = graft.Bench.loadSnapshot()
        val dj = math.max(1L, jiffies - jiffiesPrev)
        println(f"[stream] batch $b: docs=$bn%d wall=$s%7.1f s " +
          f"rate=${bn / s}%9.1f docs/s survivors=${outN - prevOut}%d " +
          f"cumulative=$outN%d load1=$load1%.2f " +
          f"iowait=${100.0 * (iowait - iowaitPrev) / dj}%.3f%% " +
          f"steal=${100.0 * (steal - stealPrev) / dj}%.3f%%")
        load1Prev = load1; iowaitPrev = iowait; stealPrev = steal
        jiffiesPrev = jiffies
        prevOut = outN
      }
    } finally {
      q.stop()
      graft.ext.TrainingPipeline.releaseIngestState(s"$outDir/out")
    }
  }
}
