package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{GraftSession, Tables}
import graft.functions.TextOps

/** A/B probe for the r10 gopher-repetition gram-census CANDIDATE: times
  * the xxhash64-keyed census against the string-keyed default in ONE
  * JVM, interleaved A/B/A/B so JIT warmup cannot favor either side
  * (the DecadeProbe discipline). Also asserts the two variants are
  * value-identical on the measured data before timing.
  *
  * Usage: runMain graft.tools.GopherGramProbe [sfDir] [rounds]
  */
object GopherGramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tuned(spark)
    val docs = Tables.load(spark, sfDir, "documents")

    val h = TextOps.gopherRepetitionOf(docs, hashedGrams = true)
    val s = TextOps.gopherRepetitionOf(docs, hashedGrams = false)
    require(h.exceptAll(s).isEmpty && s.exceptAll(h).isEmpty,
      "hashed and string censuses must be value-identical")
    println(s"[gopher-ab] equivalence OK at $sfDir")

    def time(label: String, hashed: Boolean): Double = {
      val t0 = System.nanoTime()
      TextOps.gopherRepetitionOf(docs, hashedGrams = hashed)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[gopher-ab] $label%-7s $sec%7.2f s")
      sec
    }
    time("warmup", hashed = true); time("warmup", hashed = false)
    val pairs = (1 to rounds).map(_ => (time("hashed", true), time("string", false)))
    val (hs, ss) = (pairs.map(_._1), pairs.map(_._2))
    println(f"[gopher-ab] median hashed=${hs.sorted.apply(hs.size / 2)}%.2f s " +
      f"string=${ss.sorted.apply(ss.size / 2)}%.2f s")

    // stage attribution: where does the wall-clock actually go?
    import org.apache.spark.sql.functions._
    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[gopher-ab] stage $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val base = docs
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("__t"),
        TextOps.normalizeText(col("text")).as("__norm"))
      .withColumn("__nc", length(col("__norm")).cast("long"))
      .withColumn("__tk", expr("filter(split(__norm, ' '), x -> x <> '')"))
    timed("tokenize")(base)
    val gramRows = base
      .select(col("doc_id"), col("__nc"), explode(expr(
        """flatten(transform(array(2, 3, 4, 5), n ->
          |  CASE WHEN size(__tk) >= n
          |    THEN transform(sequence(0, size(__tk) - n),
          |           i -> struct(n AS n, concat_ws(' ', slice(__tk, i + 1, n)) AS g))
          |    ELSE CAST(array() AS ARRAY<STRUCT<n: INT, g: STRING>>) END))"""
          .stripMargin)).as("p"))
      .select(col("doc_id"), col("__nc"), col("p.n").as("n"), col("p.g").as("g"))
    timed("explode")(gramRows)
    timed("census-string")(gramRows
      .groupBy(col("doc_id"), col("__nc"), col("n"), col("g"))
      .agg(count(lit(1)).as("c")))
    timed("census-hashed")(gramRows
      .groupBy(col("doc_id"), col("__nc"), col("n"), xxhash64(col("g")).as("__gh"))
      .agg(count(lit(1)).as("c"), max(col("g")).as("g")))
    spark.stop()
  }
}
