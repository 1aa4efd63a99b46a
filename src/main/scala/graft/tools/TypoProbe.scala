package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}

/** Dev harness: stage timing + candidate-volume census of the SymSpell
  * typo-pair blocking at a given SF dir.
  */
object TypoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf2")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cust = Tables.load(spark, dir, "customer")
    val dnames = cust.select(col("c_name").as("name")).distinct()
      .localCheckpoint()
    println(s"[probe] distinct names = ${dnames.count()}")
    val variants = dnames.select(col("name"), explode(expr(
      """array_distinct(transform(
        |  concat(array(name),
        |    transform(sequence(1, length(name)),
        |      i -> concat(substring(name, 1, i - 1),
        |                  substring(name, i + 1, length(name) - i)))),
        |  v -> xxhash64(v)))""".stripMargin))
      .as("vh")).localCheckpoint()
    println(s"[probe] variant rows = ${variants.count()}")
    val buckets = variants.groupBy("vh").agg(count(lit(1)).as("b"))
    time("bucket census")(
      buckets.agg(count(lit(1)), max("b"),
        sum(col("b") * (col("b") - 1) / 2).as("cand_pairs")).show(false))
    val joined = variants.select(col("name").as("na"), col("vh"))
      .join(variants.select(col("name").as("nb"), col("vh")), Seq("vh"))
      .where(col("na") < col("nb"))
    time("join count")(println("[probe] candidates = " + joined.count()))
    time("join+lev count")(println("[probe] lev survivors = " +
      joined.where(levenshtein(col("na"), col("nb"), 1) === 1).count()))
    time("join+lev+distinct")(println("[probe] distinct pairs = " +
      joined.where(levenshtein(col("na"), col("nb"), 1) === 1)
        .select("na", "nb").distinct().count()))
    spark.stop()
  }
}
