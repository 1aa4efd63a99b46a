package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Honesty contract: a query that throws is recorded under "errors" with
  * its message and EXCLUDED from the total — a crash can never read as a
  * speedup. `SPARK_GRAFT_ONLY=q_a,q_b` restricts to a subset (local
  * iteration only; the driver runs the full set).
  *
  * Cost-attribution caveat: queries that share a session-memoized
  * computation charge the shared work to whichever of them runs FIRST
  * in map-iteration order; the others read the cache. The groups:
  * the near-dup trio (Dedup.nearDupPairsShared / nearDupLabels), the
  * exact-substring pair (Dedup.substrDupPosShared), and — since the
  * r12 optimization round — the event-graph family (q_pagerank/q_hits/
  * q_triangle_stats/q_kcore/q_kcore_fixpoint/q_label_propagation/
  * q_reach_paths/q_graph_degrees share GraphOps.sharedEdges +
  * sharedNodes), the containment pair (q_containment_join +
  * q_pagerank_docs share Dedup.containmentPairsShared), the typo
  * twins (MiningOps' typoNamePairsShared), the time-series family
  * (q_seasonality/q_acf/q_ljung_box/q_cusum/q_stl_decompose/
  * q_seasonal_anomalies/q_siegel_trend/q_theil_sen share
  * TimeSeries.sharedDailyRevenue; the STL pair additionally shares
  * TimeSeries.sharedStlResidual), the Gram pair (q_embed_gram +
  * q_pca_project share Similarity.sharedEmbedGram), the IVF pair
  * (q_ann_ivf_topk + q_ann_ivfpq_topk share
  * Similarity.sharedKmeansCentroids), and the BPE trio (q_bpe_merges/
  * q_bpe_encode/q_sequence_pack_bpe share TextOps.bpeTrainShared).
  * Per-key numbers for those keys are attribution, not standalone
  * cost — compare the GROUP's sum across rounds, or the run total.
  */
object Bench {
  /** Driver-facing final stdout line. The driver keeps only a BOUNDED
    * log tail (measured: 2000 bytes — every BENCH_r*.json since r01
    * carries exactly len(tail)==2000), so the full 273-key per-query
    * JSON (~6.4 KB) can NEVER survive it, wherever it is printed; it
    * has been front-truncated (`parsed: null`) in ALL 12 rounds. This
    * line therefore carries the contract fields (metric/value/unit/
    * queries/sf) with the TOP-K most expensive queries — the ones that
    * carry the total — greedily packed under `budget` bytes so the
    * line survives the tail complete, plus `queries_omitted` (count)
    * and `omitted_max_s` (upper bound on every omitted key's seconds)
    * so a consumer knows exactly what the truncation hides. No query
    * is removed from the RUN: all keys are timed, summed into `value`,
    * and recorded in the artifact file + the early `total_full` stdout
    * line, which keep the complete map. Selection is by measured
    * seconds (desc, name tie-break) — deterministic given the timings.
    */
  def compactTotalLine(ok: Seq[(String, Double)], nErrors: Int,
      loadJson: String, sfDir: String, budget: Int = 1650): String = {
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = ok.map(_._2).sum
    val ranked = ok.sortBy { case (k, v) => (-v, k) }
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${ok.size},"errors":$nErrors,"""
    val tailFixedMax = // worst-case suffix: omitted fields + load + sf
      s""""queries_omitted":${ok.size},"omitted_max_s":99999.999,$loadJson,"sf":"$sfDir"}""".length
    var used = head.length + "\"queries\":{}".length + tailFixedMax
    val taken = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var i = 0
    var full = true
    while (i < ranked.length && full) {
      val (k, v) = ranked(i)
      val entry = s""""$k":${fmt(v)}""".length + 1 // +1 for comma
      if (used + entry <= budget) { taken += ((k, v)); used += entry; i += 1 }
      else full = false
    }
    val omitted = ranked.drop(taken.length)
    val omittedMax = if (omitted.isEmpty) 0.0 else omitted.map(_._2).max
    val qs = taken.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    head + s""""queries":$qs,"queries_omitted":${omitted.length},""" +
      s""""omitted_max_s":${fmt(omittedMax)},$loadJson,"sf":"$sfDir"}"""
  }

  /** (load1, iowait_jiffies, steal_jiffies, total_jiffies) from
    * /proc/loadavg + /proc/stat — ambient-contention evidence recorded
    * at run start AND end inside every artifact, so a promote decision
    * (or a cross-run regression adjudication) can cite measured load
    * instead of inferring it from parked re-runs (the r11 lesson: two
    * promote attempts burned on steal attribution done by inference).
    * Zeros when /proc is unreadable (non-Linux dev box) — fields still
    * present so consumers need no schema branch.
    */
  private[graft] def loadSnapshot(): (Double, Long, Long, Long) = {
    def readFile(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Exception => None }
    val load1 = readFile("/proc/loadavg")
      .flatMap(_.split("\\s+").headOption).flatMap(_.toDoubleOption)
      .getOrElse(0.0)
    // first line: "cpu  user nice system idle iowait irq softirq steal ..."
    val cpu = readFile("/proc/stat").toSeq
      .flatMap(_.linesIterator.find(_.startsWith("cpu ")))
      .flatMap(_.split("\\s+").drop(1).flatMap(_.toLongOption))
    val iowait = if (cpu.length > 4) cpu(4) else 0L
    val steal = if (cpu.length > 7) cpu(7) else 0L
    (load1, iowait, steal, cpu.sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (load1Start, iowait0, steal0, jiffies0) = loadSnapshot()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = SparkEntry.onlyFilter
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    // absorb session/codegen warmup outside any query's timing (the
    // first timed query otherwise carries ~1-4 s of JVM/session init)
    spark.range(100).selectExpr("sum(id)").collect()
    // absorb the OS page-cache warmup outside any query's timing too
    // (r12 verdict item 4: the driver's cold run charged first-touch
    // file reads to whichever keys happened to run first — q_date_funcs
    // read 12.98 s at c32 vs 0.58 s in the back-to-back c8 run — which
    // makes per-key numbers incomparable between the main and
    // low-core runs now that the driver can parse them). This streams
    // every input parquet byte once, OUTSIDE the timed region; every
    // query still computes from the parquet inputs (nothing is parsed,
    // decoded, or cached at the Spark layer). Measurement fix per
    // guide §1 — documented in OPTIMIZATION_r13.md with the old
    // numbers kept; totals drop by the first-touch tax, so cross-round
    // total comparisons must note it.
    try {
      val buf = new Array[Byte](1 << 20)
      def walk(f: java.io.File): Unit =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(walk)
        else if (f.getName.endsWith(".parquet")) {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      walk(new java.io.File(sfDir))
    } catch { case _: Exception => () } // warmup must never fail the bench
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // execute the query's OWN physical plan (projections, sorts and
      // all): df.count() would let Catalyst prune every computed column
      // and eliminate the sort, timing a bare scan instead of the query
      val err = try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
        catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val ok = results.collect { case (k, v, None) => k -> v }
    val errs = results.collect { case (k, _, Some(m)) => k -> m }
    // 3-decimal (ms) precision keeps the line compact: the driver
    // captures a bounded log tail, and at 90 queries full-precision
    // doubles pushed the JSON past the capture window (BENCH_r02.json's
    // tail lost 18 queries to truncation)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) // locale-pinned: no comma decimals
    val qs = ok.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => s""""$k":"${esc(m)}"""" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val (load1End, iowait1, steal1, jiffies1) = loadSnapshot()
    // measured ambient contention for this run: loadavg at both ends +
    // the machine-wide iowait/steal jiffy shares over the run window.
    // BASELINE promote policy cites these (thresholds there): a run with
    // load1_start much above the solo band or steal_pct > ~1% is
    // contended evidence, not a regression.
    val loadJson =
      s""""load":{"load1_start":${fmt(load1Start)},"load1_end":${fmt(load1End)},""" +
        s""""iowait_pct":${fmt(100.0 * (iowait1 - iowait0) / math.max(1L, jiffies1 - jiffies0))},""" +
        s""""steal_pct":${fmt(100.0 * (steal1 - steal0) / math.max(1L, jiffies1 - jiffies0))}}"""
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$es,$loadJson,"sf":"$sfDir"}"""
    // Full per-query map to stdout EARLY, under metric "total_full":
    // exactly ONE metric=="total" object goes to stdout per run (the
    // driver-facing final line below). The artifact file (written
    // further down) keeps the full map under metric "total", unchanged
    // from every previous round's artifact format.
    println(line.replaceFirst("\"metric\":\"total\"", "\"metric\":\"total_full\""))
    // Driver-facing line: the full 273-key map (~6.4 KB) has been
    // front-truncated by the driver's 2000-byte log tail in ALL 12
    // rounds (`parsed: null` in every BENCH_r*.json). The final stdout
    // write is a COMPLETE metric=="total" object sized to survive that
    // tail: contract fields + the top-K most expensive queries +
    // queries_omitted/omitted_max_s (see compactTotalLine). Replaces
    // r11/r12's "total_compact" line, which carried no queries map at
    // all and a non-contract metric name — the driver parsed nothing.
    val compactLine = compactTotalLine(ok.toSeq, errs.size, loadJson, sfDir)
    // the driver captures a BOUNDED log tail (BENCH_r03.json lost 52 of
    // 136 queries to truncation) — also land the full line in a file so
    // an artifact always carries every query. Artifact-of-record
    // discipline (the r9 verdict's recurrence of the r8 lesson — the
    // committed BENCH_FULL_sf0.1.json was auto-clobbered twice in one
    // round): a full run lands in gitignored bench_runs/ under a
    // timestamped name by DEFAULT; the record path
    // BENCH_FULL_<sf>.json is written ONLY when the operator opts in
    // with SPARK_GRAFT_BENCH_PROMOTE=1 (or names any path via
    // SPARK_GRAFT_BENCH_OUT). SPARK_GRAFT_ONLY subset runs never write
    // a default artifact (a 1-query iteration must not masquerade as a
    // full-run record).
    // artifact root: SPARK_GRAFT_REPO_ROOT if set, else the cwd ONLY
    // when it is recognizably the repo root (build.sbt present) — a
    // Bench launched from elsewhere must not silently drop files into
    // an arbitrary directory
    val repoRoot = sys.env.get("SPARK_GRAFT_REPO_ROOT").orElse(
      Some(".").filter(_ =>
        java.nio.file.Files.exists(java.nio.file.Paths.get("build.sbt"))))
    val promote = sys.env.get("SPARK_GRAFT_BENCH_PROMOTE").contains("1")
    val outFile = sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(
      if (only.isEmpty) repoRoot match {
        case Some(root) =>
          val sfName = new java.io.File(sfDir).getName
          if (promote) Some(s"$root/BENCH_FULL_$sfName.json")
          else {
            val stamp = java.time.format.DateTimeFormatter
              .ofPattern("yyyyMMdd'T'HHmmss")
              .withZone(java.time.ZoneOffset.UTC)
              .format(java.time.Instant.now())
            val dir = java.nio.file.Paths.get(root, "bench_runs")
            try java.nio.file.Files.createDirectories(dir)
            catch { case _: Exception => () }
            Some(s"$dir/BENCH_FULL_${sfName}_$stamp.json")
          }
        case None =>
          System.err.println(
            "[bench] cwd is not the repo root and SPARK_GRAFT_REPO_ROOT/" +
              "SPARK_GRAFT_BENCH_OUT are unset - skipping the artifact write")
          None
      }
      else None)
    outFile.foreach { f =>
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(f),
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[bench] artifact written to $f" +
          (if (!promote && !sys.env.contains("SPARK_GRAFT_BENCH_OUT"))
            " (run record; set SPARK_GRAFT_BENCH_PROMOTE=1 to update the committed artifact-of-record)"
          else ""))
      }
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $f: ${e.getMessage}") }
    }
    spark.stop()
    // final stdout write of the program (artifact notes above went to
    // stderr; spark.stop() logs at WARN go to stderr too): a bounded
    // tail capture of stdout ends with this parseable object
    println(compactLine)
  }
}
