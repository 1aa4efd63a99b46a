package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints the formatted physical plan of selected
  * registered queries plus quick red-flag grep lines (missing pushdown,
  * unexpected cartesian products, absent broadcasts).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.sameElements(Array("--all"))) graft.Catalog.all.map(_.name)
      else if (args.nonEmpty) args.toSeq
      else Seq("q_join_chain", "q_filter", "q_group_agg", "q_curated",
        "q_minhash_neardup", "q_cosine_topk", "q_sort_limit")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.Catalog.byName(n).build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n================ $n ================")
      println(plan)
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-WholeStageCodegen" -> !(plan.contains("codegen id") || plan.contains("WholeStageCodegen")),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "PushedFilters-present" -> plan.contains("PushedFilters: ["))
      println(s"[audit] $n flags: " + flags.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
