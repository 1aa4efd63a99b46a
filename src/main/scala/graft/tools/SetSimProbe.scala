package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}
import graft.ext.{Blocking, Dedup}

/** Prove-or-revert probe for the r12 setSim/containment rewrite (the
  * r12 verdict's item 1): times the CURRENT shape (one sh-keyed
  * repartition shared by census + rarity join; verify on the
  * rarity-ordered arrays) against a faithful copy of the r11 shape
  * (independent census/rarity subtrees, verify re-deriving the raw
  * shingle sets) in ONE JVM, interleaved A/B/A/B (the GopherGramProbe
  * discipline), asserting value-equivalence first. After timing it
  * re-runs the current shape and prints the EXECUTED adaptive plan so
  * runtime stage reuse (ReusedExchange / reused ShuffleQueryStage) is
  * observable evidence, not an inference from the static plan. Ambient
  * steal/iowait over the probe window is printed from /proc/stat so a
  * contended run self-reports.
  *
  * Usage: runMain graft.tools.SetSimProbe [sfDir] [rounds] [which]
  *   which ∈ setsim | containment | both (default both)
  */
object SetSimProbe {
  // ---- faithful r11 shapes (da15b7d~1), inlined so the library keeps
  // ---- exactly one production definition ------------------------------
  private def jac(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  def setSimR11(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = Dedup.hashedShingleSets(docs, textCol, idCol, shingleN)
    val docFreq = sets.select(explode(col("shs")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    val ordered = sets.select(col(idCol), explode(col("shs")).as("sh"))
      .join(docFreq, "sh")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("o"))
      .select(col(idCol), expr("transform(o, x -> x.sh)").as("oshs"))
    val withPre = ordered
      .withColumn("n", size(col("oshs")))
      .withColumn("pre", expr(
        s"slice(oshs, 1, size(oshs) - CAST(ceil($threshold * size(oshs)) AS INT) + 1)"))
    val p1 = withPre.select(col(idCol).as("id1"), col("n").as("n1"),
      explode(col("pre")).as("sh"))
    val p2 = withPre.select(col(idCol).as("id2"), col("n").as("n2"),
      explode(col("pre")).as("sh"))
    val cands = p1.join(p2.hint("merge"), Seq("sh"))
      .where(col("id1") < col("id2"))
      .where(least(col("n1"), col("n2")).cast("double") >=
        lit(threshold) * greatest(col("n1"), col("n2")).cast("double"))
      .select("id1", "id2")
      .distinct()
    cands
      .join(sets.select(col(idCol).as("id1"), col("shs").as("sh1"))
        .hint("merge"), "id1")
      .join(sets.select(col(idCol).as("id2"), col("shs").as("sh2"))
        .hint("merge"), "id2")
      .select(col("id1"), col("id2"), jac(col("sh1"), col("sh2")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("id1", "id2")
  }

  def containmentR11(docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, threshold: Double = 0.8,
      maxDf: Int = 10000): DataFrame = {
    val sets = Dedup.hashedShingleSets(docs, textCol, idCol, shingleN)
    val tok = sets.select(col(idCol), size(col("shs")).as("n"),
      explode(col("shs")).as("sh"))
    val docFreq = tok.groupBy("sh").agg(count(lit(1)).as("df"))
    val ordered = tok
      .join(docFreq.hint("merge"), "sh")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("o"))
      .select(col(idCol), expr("transform(o, x -> x.sh)").as("oshs"))
    val withPre = ordered
      .withColumn("nsub", size(col("oshs")))
      .withColumn("pre", expr(
        s"slice(oshs, 1, size(oshs) - CAST(ceil($threshold * size(oshs)) AS INT) + 1)"))
    val hot = docFreq.where(col("df") > maxDf).select("sh")
    val subSide = Blocking.pruneGroups(
      withPre.select(col(idCol).as("sub_id"), col("nsub"),
        explode(col("pre")).as("sh")),
      hot, Seq("sh"))
    val supSide = Blocking.pruneGroups(
      tok.select(col(idCol).as("sup_id"), col("n").as("nsup"), col("sh")),
      hot, Seq("sh"))
    val cands = subSide.join(supSide.hint("merge"), Seq("sh"))
      .where(col("sub_id") =!= col("sup_id"))
      .where(col("nsup").cast("double") >=
        lit(threshold) * col("nsub").cast("double"))
      .select("sub_id", "sup_id")
      .distinct()
    cands
      .join(sets.select(col(idCol).as("sub_id"), col("shs").as("sh1"))
        .hint("merge"), "sub_id")
      .join(sets.select(col(idCol).as("sup_id"), col("shs").as("sh2"))
        .hint("merge"), "sup_id")
      .select(col("sub_id"), col("sup_id"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(col("sh1")).cast("double")).as("containment"))
      .where(col("containment") >= threshold)
      .orderBy("sub_id", "sup_id")
  }

  private def jiffies(): (Long, Long, Long) = {
    val cpu = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/stat")))
      .linesIterator.find(_.startsWith("cpu ")).get
      .split("\\s+").drop(1).flatMap(_.toLongOption)
    (cpu(4), cpu(7), cpu.sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val which = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tuned(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    val (io0, st0, j0) = jiffies()

    def ab(name: String, current: => DataFrame, r11: => DataFrame): Unit = {
      require(current.exceptAll(r11).isEmpty && r11.exceptAll(current).isEmpty,
        s"$name: current and r11 shapes must be value-identical")
      println(s"[setsim-ab] $name equivalence OK at $sfDir")
      def time(label: String, df: => DataFrame): Double = {
        spark.sparkContext.setJobDescription(s"$name:$label")
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[setsim-ab] $name $label%-8s $sec%7.2f s")
        sec
      }
      time("warmup-c", current); time("warmup-o", r11)
      val pairs = (1 to rounds).map(_ => (time("current", current), time("r11", r11)))
      val (cs, os) = (pairs.map(_._1), pairs.map(_._2))
      println(f"[setsim-ab] $name median current=${cs.sorted.apply(cs.size / 2)}%.2f s " +
        f"r11=${os.sorted.apply(os.size / 2)}%.2f s " +
        f"min current=${cs.min}%.2f r11=${os.min}%.2f")
      // executed adaptive plan of the current shape: runtime stage-reuse
      // evidence (static plans cannot show AQE reuse)
      val q = current
      q.queryExecution.toRdd.count()
      val executed = q.queryExecution.executedPlan.toString
      val reused = executed.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("reuses"))
      val exch = executed.linesIterator.count(_.contains("Exchange"))
      println(s"[setsim-ab] $name executed plan: $exch Exchange lines, $reused reuse lines")
      println(s"================ EXECUTED $name ================")
      println(executed)
    }

    if (which == "setsim" || which == "both")
      ab("setsim",
        Dedup.setSimJoin(docs, "text", "doc_id"),
        setSimR11(docs, "text", "doc_id"))
    if (which == "containment" || which == "both")
      ab("containment",
        Dedup.containmentJoin(docs, "text", "doc_id"),
        containmentR11(docs, "text", "doc_id"))

    val (io1, st1, j1) = jiffies()
    println(f"[setsim-ab] window iowait=${100.0 * (io1 - io0) / math.max(1L, j1 - j0)}%.3f%% " +
      f"steal=${100.0 * (st1 - st0) / math.max(1L, j1 - j0)}%.3f%%")
    spark.stop()
  }
}
