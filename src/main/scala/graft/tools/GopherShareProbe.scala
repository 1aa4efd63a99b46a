package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{GraftSession, Tables}
import graft.functions.TextOps

/** A/B probe for the r13 gopher-repetition SHARED-UNIT candidate (the
  * r12 verdict's item 3): one doc_id-keyed exchange feeding all three
  * unit censuses vs the r12 shape (independent per-census subtrees,
  * each with its own map-side-combined exchange). Interleaved A/B/A/B
  * in one JVM with an up-front value-equivalence assert — the
  * GopherGramProbe discipline.
  *
  * Usage: runMain graft.tools.GopherShareProbe [sfDir] [rounds]
  */
object GopherShareProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
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

    val sh = TextOps.gopherRepetitionOf(docs, sharedUnits = true)
    val un = TextOps.gopherRepetitionOf(docs, sharedUnits = false)
    require(sh.exceptAll(un).isEmpty && un.exceptAll(sh).isEmpty,
      "shared and unshared census shapes must be value-identical")
    println(s"[gopher-share] equivalence OK at $sfDir")

    def time(label: String, shared: Boolean): Double = {
      spark.sparkContext.setJobDescription(s"gopher:$label")
      val t0 = System.nanoTime()
      TextOps.gopherRepetitionOf(docs, sharedUnits = shared)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[gopher-share] $label%-9s $sec%7.2f s")
      sec
    }
    time("warmup-s", shared = true); time("warmup-u", shared = false)
    val pairs = (1 to rounds).map(_ => (time("shared", true), time("unshared", false)))
    val (ss, us) = (pairs.map(_._1), pairs.map(_._2))
    println(f"[gopher-share] median shared=${ss.sorted.apply(ss.size / 2)}%.2f s " +
      f"unshared=${us.sorted.apply(us.size / 2)}%.2f s min shared=${ss.min}%.2f unshared=${us.min}%.2f")

    // runtime stage-reuse evidence for the shared shape
    val q = TextOps.gopherRepetitionOf(docs, sharedUnits = true)
    q.queryExecution.toRdd.count()
    val executed = q.queryExecution.executedPlan.toString
    val reused = executed.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("reuses"))
    val exch = executed.linesIterator.count(_.contains("Exchange"))
    println(s"[gopher-share] executed plan: $exch Exchange lines, $reused reuse lines")
    spark.stop()
  }
}
