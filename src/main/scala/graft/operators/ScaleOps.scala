package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB design notes (SURVEY §7.5): skew-salted
  * joins, bucketed co-located joins, and partitioned sinks. These are
  * engine API, exercised by ScaleOpsSpec; they have no reference-grounded
  * query keys of their own (the reference ran at AdventureWorks scale and
  * needed none of them — at 100 TB they are what keeps the same logical
  * plans alive).
  */
object ScaleOps {

  /** Skew-salted LEFT equi-join: the left (large, skewed) side gets a
    * random-but-deterministic salt in [0, buckets); the right side is
    * exploded `buckets`× so every (key, salt) pair can match. Same result
    * as a plain equi-join, but a hot key's rows spread over `buckets`
    * reducers instead of one straggler.
    *
    * AQE's skew-join handles most cases at runtime (GraftSession enables
    * it); explicit salting remains for deterministic layout control and
    * for non-sort-merge paths AQE won't split.
    */
  def saltedLeftJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    // content-derived salt: stable across task re-execution even when the
    // input's row order is shuffle-dependent (monotonically_increasing_id
    // would re-salt rows differently on a retried map task and corrupt
    // the join — the SPARK-23207 failure class). Rows with identical full
    // content share a salt; a hot KEY still spreads because its rows
    // differ in the other columns.
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val exploded = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt"), "left_outer").drop("__salt")
  }

  /** q_salted_join: the skew-salted join on the driver's correctness
    * surface — its oracle is the PLAIN left join, proving the salting
    * rewrite is semantics-preserving, not just fast.
    */
  def saltedJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.engine.Tables.load(graft.engine.GraftSession.tuned(s), dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("k"))
    val customer = graft.engine.Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    saltedLeftJoin(orders, customer, "k", buckets = 8)
      .select(col("o_orderkey"), col("c_name"))
      .orderBy(col("o_orderkey"), col("c_name").asc_nulls_first)
  }

  /** q_partitioned_sink: the 100 TB sink pattern on the driver's
    * correctness surface — write orders `partitionBy(o_orderpriority)`,
    * read back with a partition-column predicate (pruned to ONE
    * directory — PartitionFilters, asserted in ScaleOpsSpec), and
    * project. The oracle reads the original table directly, proving the
    * partitioned round-trip is lossless. This is the replacement for the
    * reference's `coalesce(1)` single-file sink (SURVEY §7.4 risk 7).
    */
  def partitionedSinkQuery(s: SparkSession, dir: String): DataFrame = {
    val spark = graft.engine.GraftSession.tuned(s)
    val orders = graft.engine.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    // applicationId in the path: two concurrent drivers (e.g. Bench and
    // Verify on the same SF) must not overwrite each other's sink
    // mid-read. Per-app dirs would otherwise accumulate forever, so
    // prune siblings idle > 2h (old enough that no live driver owns them)
    val root = new java.io.File("/tmp/graft_sink")
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.lastModified() < cutoff)
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(d)
      }
    val path = root.getPath + "/" + spark.sparkContext.applicationId + "/" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "/orders_by_priority"
    writePartitioned(orders, path, "o_orderpriority")
    partitionPrunedRead(spark, path)
  }

  /** The read side of [[partitionedSinkQuery]], separated so tests can
    * assert the plan's PartitionFilters.
    */
  def partitionPrunedRead(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("total_price"), col("o_orderpriority"))
      .orderBy("o_orderkey")

  /** Key-skew diagnostic: top-N heaviest keys with their corpus share
    * and the skew factor (top count / mean count) — the pre-join report
    * that decides whether a key needs salting ([[saltedLeftJoin]]) or
    * AQE skew handling. One aggregation plus a driver-side top-N merge
    * (TakeOrderedAndProject): no global sort, no second scan.
    */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(
        col(key), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        (col("cnt").cast("double") *
          col("n_keys").cast("double") / col("total").cast("double"))
          .as("skew_factor"))
      // nulls LAST on the tiebreak: Spark's asc default is nulls first,
      // DuckDB's is nulls last — a NULL key tied at the top-N boundary
      // would otherwise select different rows per engine
      .orderBy(col("cnt").desc, col(key).asc_nulls_last)
      .limit(topN)
  }

  /** q_skew_report over lineitem's supplier key. */
  def skewReportQuery(s: SparkSession, dir: String): DataFrame = {
    val spark = graft.engine.GraftSession.tuned(s)
    keySkewReport(
      graft.engine.Tables.load(spark, dir, "lineitem"), "l_suppkey")
  }

  /** Cross-engine-exact Morton codes over (custkey bucket, order-day
    * bucket): the sort key [[writeZOrdered]] lays files out by. The
    * registered query pins `graft_zorder`'s bit interleave against
    * DuckDB's explicit shift-and-sum arithmetic, row for row.
    */
  def zorderQuery(s: SparkSession, dir: String): DataFrame = {
    val spark = graft.engine.GraftSession.tuned(s)
    graft.engine.Tables.load(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        (col("o_custkey") % 1024).as("x"),
        (datediff(col("o_orderdate"),
          lit("1992-01-01").cast(org.apache.spark.sql.types.DateType))
          .cast("long") % 1024).as("y"))
      .withColumn("zval", expr("graft_zorder(x, y)"))
      .orderBy("o_orderkey")
  }

  /** Z-ordered sink: range-partition + sort on the 2-D Morton code of
    * (`c1`, `c2`), so every output file covers a narrow range of BOTH
    * columns and parquet footer min/max prunes on either predicate —
    * what [[writeSorted]] does for one column, extended to two.
    * (A single-column sort leaves the second column full-span in every
    * file: footers prune nothing for filters on it.) Inputs are
    * bucketed into [0, 2^21) by the caller-supplied expressions.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: Column, c2: Column,
      nFiles: Int): Unit = {
    // graft_zorder is a session temp function; register (idempotent) so
    // the writer works on a plain SparkSession like every other sink here
    graft.functions.HashExprs.register(df.sparkSession)
    df.withColumn("__zx", c1).withColumn("__zy", c2)
      .withColumn("__z", expr("graft_zorder(__zx, __zy)"))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__zx", "__zy")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  val queries: Seq[graft.GraftQuery] = Seq(
    graft.GraftQuery("q_salted_join", "skew-salted left join == plain join (semantics-preserving rewrite)",
      saltedJoinQuery,
      Some(
        """SELECT o_orderkey, c_name
          |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_orderkey, c_name NULLS FIRST""".stripMargin)),
    graft.GraftQuery("q_partitioned_sink", "partitionBy sink + partition-pruned read-back == direct table read",
      partitionedSinkQuery,
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice AS total_price, o_orderpriority
          |FROM orders WHERE o_orderpriority = '1-URGENT'
          |ORDER BY o_orderkey""".stripMargin)),
    graft.GraftQuery("q_skew_report", "top-N key-skew diagnostic: share + skew factor per heavy key",
      skewReportQuery,
      Some(
        """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
          |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM c)
          |SELECT l_suppkey, cnt,
          |       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
          |       CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total AS DOUBLE) AS skew_factor
          |FROM c, t ORDER BY cnt DESC, l_suppkey LIMIT 10""".stripMargin)),
    graft.GraftQuery("q_zorder", "native graft_zorder Morton codes == DuckDB shift-and-sum bit arithmetic",
      zorderQuery,
      Some(
        """WITH b AS (
          |  SELECT o_orderkey,
          |         o_custkey % 1024 AS x,
          |         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) % 1024 AS y
          |  FROM orders)
          |SELECT o_orderkey, x, y,
          |       CAST(list_sum(list_transform(range(0, 31), i -> ((x >> i) & 1) << (2*i))) +
          |            list_sum(list_transform(range(0, 31), i -> ((y >> i) & 1) << (2*i + 1))) AS BIGINT) AS zval
          |FROM b ORDER BY o_orderkey""".stripMargin)),
  )

  /** Write both sides bucketed on the join key so a later join is
    * co-located: no Exchange on either side of the SortMergeJoin.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key. The
    * `merge` hint pins SortMergeJoin (at demo scale the planner would
    * otherwise broadcast, which disables bucket use); with matching
    * bucket specs the SMJ needs no shuffle Exchange on either side —
    * the co-located join pattern for repeatedly-joined 100 TB tables.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), Seq(key))

  /** Partitioned sink: `partitionBy` layout so downstream reads prune by
    * partition column — the 100 TB replacement for `coalesce(1)`
    * (SURVEY §7.4 risk 7).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Sorted sink: range-partition on `sortCol`, sort within each
    * partition, write. Every output file then covers a narrow,
    * non-overlapping `sortCol` range, so its parquet footer min/max
    * lets a selective reader skip whole files/row-groups — the
    * Z-order-lite layout a 100 TB table wants on its hottest filter
    * column. (An unsorted write gives every file ≈ the full value
    * range: footers prune nothing.) `nFiles` sizes the layout;
    * repartitionByRange samples ranges, so data skew in `sortCol`
    * still yields balanced files.
    */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Small-file compaction of ONE parquet directory (a table, or the
    * single partition directory a compaction scheduler hands each
    * worker): rewrite to ceil(totalBytes / targetFileBytes) files.
    * Streaming sinks and over-parallel writers accrete thousands of
    * KB-sized files per partition; at 100 TB that turns every scan into
    * a metadata storm (one task + one open per tiny file). Returns the
    * file count written. Write-then-swap into place is the caller's
    * transactional concern; this writes to a fresh `outDir`.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    // guard the documented one-directory contract: a partitionBy ROOT
    // has only subdirectories here — sizing would see 0 bytes while the
    // recursive read loads every partition, silently funneling the
    // whole table into one file and folding partition columns away
    require(totalBytes > 0L,
      s"compact: no parquet files directly under $inDir — pass one leaf " +
        "(partition) directory, not a partitioned table root")
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // repartition (round-robin shuffle), not coalesce: coalesce(n) caps
    // the READ parallelism of the whole job, repartition keeps the scan
    // wide and only funnels at the write
    spark.read.parquet(inDir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }
}
