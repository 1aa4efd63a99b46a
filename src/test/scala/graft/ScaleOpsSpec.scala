package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** The 100 TB utilities must preserve semantics AND produce the plans
  * they promise (no Exchange for bucketed joins, PartitionFilters for
  * partitioned reads, identical results for salted joins).
  */
class ScaleOpsSpec extends SparkTestBase {

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("salted left join returns exactly the plain join's result") {
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_outer")
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    val salted = ScaleOps.saltedLeftJoin(
        orders.withColumnRenamed("o_custkey", "k"),
        customer.withColumnRenamed("c_custkey", "k").select("k", "c_name"),
        "k", buckets = 7)
      .select(col("o_orderkey"), col("c_name"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    assert(salted == plain)
  }

  test("bucketed co-located join plans without a shuffle Exchange") {
    ScaleOps.writeBucketed(orders.select("o_custkey", "o_orderkey", "o_totalprice"),
      "graft_orders_b", "o_custkey", 4)
    ScaleOps.writeBucketed(customer.select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey"),
      "graft_cust_b", "o_custkey", 4)
    try {
      val joined = ScaleOps.bucketedJoin(spark, "graft_orders_b", "graft_cust_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must be shuffle-free, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucket pruning not used:\n$plan")
      assert(joined.count() == orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_cust_b")
    }
  }

  test("partitioned write prunes partitions on filtered read") {
    val tmp = Files.createTempDirectory("graft-part").toString
    val withYear = orders.withColumn("o_year", year(col("o_orderdate")))
    ScaleOps.writePartitioned(withYear, s"$tmp/orders_by_year", "o_year")
    val years = new java.io.File(s"$tmp/orders_by_year").listFiles()
      .filter(_.getName.startsWith("o_year=")).map(_.getName)
    assert(years.length > 1, "expected multiple partition directories")

    val read = spark.read.parquet(s"$tmp/orders_by_year")
      .where(col("o_year") === 1995)
    val scan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*o_year".r.findFirstIn(scan).isDefined,
      s"partition filter not pushed:\n$scan")
    assert(read.count() == withYear.where(col("o_year") === 1995).count())
  }

  test("sorted write yields disjoint per-file key ranges (min/max skipping precondition)") {
    val tmp = Files.createTempDirectory("graft-sorted").toString
    ScaleOps.writeSorted(orders, s"$tmp/sorted", "o_orderkey", nFiles = 8)
    // per-file [min, max] of the sort column, from the data itself —
    // the same bounds the parquet footer records for the skip decision
    val ranges = spark.read.parquet(s"$tmp/sorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 > next lo=$lo2")
    }
    // contrast: an UNSORTED round-robin write spreads the full key range
    // over every file — footer min/max can prune nothing
    orders.repartition(8).write.parquet(s"$tmp/unsorted")
    val spans = spark.read.parquet(s"$tmp/unsorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => r.getLong(2) - r.getLong(1))
    val total = orders.agg(max("o_orderkey") - min("o_orderkey"))
      .head().getLong(0)
    assert(spans.forall(_ > total / 2),
      "unsorted files should each span most of the key range")
  }

  test("z-ordered write narrows per-file ranges on BOTH dimensions") {
    val tmp = Files.createTempDirectory("graft-zorder").toString
    val nFiles = 16
    // domain 128, not 1024: sf0.001 has only 150 customers, so a 1024
    // bucket domain would make the dim-1 span assertion vacuously true
    // for ANY layout (custkey % 1024 never exceeds 149); % 128 is fully
    // populated by both keys at every fixture SF
    val dom = 128
    ScaleOps.writeZOrdered(orders, s"$tmp/zordered",
      col("o_custkey") % dom, col("o_orderkey") % dom, nFiles)
    def meanSpanFrac(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .withColumn("b", col(c) % dom)
        .groupBy(input_file_name().as("f"))
        .agg((max("b") - min("b")).as("span"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length / (dom - 1).toDouble
    }
    // single-column sorted baseline: first dim narrow, second full-span
    orders.withColumn("b1", col("o_custkey") % dom)
      .repartitionByRange(nFiles, col("b1")).sortWithinPartitions("b1")
      .drop("b1").write.parquet(s"$tmp/singlesort")
    val z1 = meanSpanFrac(s"$tmp/zordered", "o_custkey")
    val z2 = meanSpanFrac(s"$tmp/zordered", "o_orderkey")
    val s2 = meanSpanFrac(s"$tmp/singlesort", "o_orderkey")
    // 16 files on a 2-D Morton curve ≈ 4×4 tiles: each dimension's
    // per-file span should be a strict fraction of the domain, while the
    // single-column sort leaves dim-2 at (almost) full span everywhere
    assert(z1 < 0.6 && z2 < 0.6,
      s"z-order spans should be narrow on both dims: $z1 / $z2")
    assert(s2 > 0.9, s"single-sort dim-2 span should be ~full: $s2")
    assert(z2 < s2 / 2,
      s"z-order must at least halve dim-2 file spans: $z2 vs $s2")
  }

  test("hilbert-ordered write: lossless, and at least as narrow as z-order on both dims") {
    val tmp = Files.createTempDirectory("graft-hilbert").toString
    val nFiles = 16
    val dom = 128
    ScaleOps.writeHilbertOrdered(orders, s"$tmp/hilbert",
      col("o_custkey") % dom, col("o_orderkey") % dom, nFiles)
    val back = spark.read.parquet(s"$tmp/hilbert")
    assert(back.count() == orders.count(), "hilbert layout is lossless")
    def meanSpanFrac(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .withColumn("b", col(c) % dom)
        .groupBy(input_file_name().as("f"))
        .agg((max("b") - min("b")).as("span"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length / (dom - 1).toDouble
    }
    val h1 = meanSpanFrac(s"$tmp/hilbert", "o_custkey")
    val h2 = meanSpanFrac(s"$tmp/hilbert", "o_orderkey")
    // 16 files over the unit-step curve = 16 contiguous tiles: both
    // dims must be strict fractions of the domain, like the z-order
    // assertion band (hilbert tiles have no seam jumps, so they are
    // never wider than morton's at the same file count)
    assert(h1 < 0.6 && h2 < 0.6,
      s"hilbert spans should be narrow on both dims: $h1 / $h2")
  }

  test("keySkewReport: heavy key first, share exact, uniform data has skew 1") {
    import spark.implicits._
    val skewed = (Seq.fill(90)(7L) ++ (1L to 10L)).toDF("k")
    val top = ScaleOps.keySkewReport(skewed, "k", topN = 3).collect()
    assert(top.head.getLong(0) == 7L && top.head.getLong(1) == 91L)
    assert(math.abs(top.head.getDouble(2) - 0.91) < 1e-12)     // share
    assert(top.head.getDouble(3) == 9.1)                        // 91 * 10 / 100
    val uniform = (1L to 50L).toDF("k")
    ScaleOps.keySkewReport(uniform, "k", topN = 5).collect()
      .foreach(r => assert(r.getDouble(3) == 1.0))
  }

  test("ANALYZE TABLE statistics reach the optimizer and estimate filter selectivity") {
    spark.sql("DROP TABLE IF EXISTS graft_stats_dim")
    customer.limit(50).write.saveAsTable("graft_stats_dim")
    spark.sql("ANALYZE TABLE graft_stats_dim COMPUTE STATISTICS FOR ALL COLUMNS")
    // CBO off (the session default): ANALYZE stats do NOT flow into
    // plan stats — this is the contrast that makes the assertions
    // below non-vacuous
    assert(spark.table("graft_stats_dim")
      .queryExecution.optimizedPlan.stats.rowCount.isEmpty)
    // rowCount/column stats only flow under the cost-based optimizer
    // (spark.sql.cbo.enabled, default off) — the production setting a
    // stats-maintained 100 TB warehouse runs with
    def set(k: String, v: String): Option[String] = {
      val prev = spark.conf.getOption(k); spark.conf.set(k, v); prev
    }
    val saved = Seq("spark.sql.cbo.enabled" -> "true")
      .map { case (k, v) => k -> set(k, v) }
    try {
      val stats = spark.table("graft_stats_dim")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(50)),
        s"ANALYZE rowCount must reach the optimizer: ${stats.rowCount}")
      assert(stats.attributeStats.nonEmpty, "column stats must be attached")
      // column min/max must drive a selectivity-scaled estimate for a
      // range predicate — the input join reorder / broadcast decisions
      // actually consume (a size-threshold broadcast would fire even
      // without stats, so THIS is the CBO-only signal)
      val filtered = spark.table("graft_stats_dim")
        .where(col("c_custkey") <= 3)
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined &&
        filtered.rowCount.get < BigInt(50),
        s"column stats must scale the filter estimate: ${filtered.rowCount}")
    } finally {
      saved.foreach { case (k, prev) =>
        prev.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP TABLE IF EXISTS graft_stats_dim")
    }
  }

  test("compact rewrites a many-small-file directory to the target file count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    events.repartition(32).write.parquet(s"$tmp/small")
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/small") == 32)
    val written = ScaleOps.compact(spark, s"$tmp/small", s"$tmp/big",
      targetFileBytes = 1L << 30)
    assert(written == 1 && parquetFiles(s"$tmp/big") == 1)
    assert(spark.read.parquet(s"$tmp/big").count() == events.count())
    // a small target keeps multiple files: ceil(total/target)
    val multi = ScaleOps.compact(spark, s"$tmp/small", s"$tmp/multi",
      targetFileBytes = 64L << 10)
    assert(multi > 1 && parquetFiles(s"$tmp/multi") == multi)
    // a partitionBy ROOT (only subdirectories) must be rejected, not
    // silently funneled into one file
    events.limit(10).write.partitionBy("event_type").parquet(s"$tmp/parted")
    val e = intercept[IllegalArgumentException](
      ScaleOps.compact(spark, s"$tmp/parted", s"$tmp/never"))
    assert(e.getMessage.contains("partitioned table root"))
  }

  test("runtime bloom filter: a selective dim filter injects bloom_filter_might_contain on the fact scan") {
    // At 100 TB a selective dimension predicate should prune the fact
    // side BEFORE the shuffle: Spark's InjectRuntimeFilter does that
    // with a bloom filter once the size thresholds allow it. Local
    // fixtures sit under the production thresholds, so lower them here;
    // production keeps the defaults and gets this for free on real
    // table sizes. (Both confs are runtime SQL confs.)
    def set(k: String, v: String): Option[String] = {
      val prev = spark.conf.getOption(k); spark.conf.set(k, v); prev
    }
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1").map { case (k, v) => k -> set(k, v) }
    try {
      // the rule only injects when it pays off: the application side
      // must already contain a shuffle the filter can prune ahead of
      // (probablyHasShuffle) — a bare scan gets nothing
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${plan.take(1500)}")
      assert(plan.contains("might_contain"),
        s"application-side probe missing:\n${plan.take(1500)}")
    } finally saved.foreach { case (k, prev) =>
      prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q_partitioned_sink: read-back plan prunes, rows match a direct filter") {
    val out = ScaleOps.partitionedSinkQuery(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(plan).isDefined,
      s"partition filter not pushed:\n$plan")
    val direct = orders.where(col("o_orderpriority") === "1-URGENT").count()
    assert(out.count() == direct)
  }

  test("minmax manifest: skipping is SOUND — no predicate-matching row in a skippable granule") {
    val manifest = ScaleOps.minmaxIndex(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(6))).toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("g"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(manifest.keySet == li.map(_._1).toSet, "one manifest row per granule")
    val (lo, hi) = (857174400000000L, 875577600000000L)
    li.foreach { case (g, us) =>
      val (_, mn, mx, skip) = manifest(g)
      assert(mn <= us && us <= mx, s"granule $g stats envelope its rows")
      if (us >= lo && us <= hi)
        assert(skip == 0, s"matching row in skippable granule $g")
    }
    // the demo window must actually exercise both branches
    val flags = manifest.values.map(_._4).toSet
    assert(flags == Set(0, 1), "window yields both skippable and must-read granules")
    manifest.foreach { case (g, (n, mn, mx, _)) =>
      assert(n == li.count(_._1 == g), s"granule $g row count")
      assert(mn <= mx)
    }
  }

  test("bloom filter: zero false negatives, plausible fp rate, deterministic digest") {
    val rows = ScaleOps.bloomFilter(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nKeys, m, nBits, digest) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    val (nPresent, presentIn) = (r.getLong(4), r.getLong(5))
    val (nAbsent, absentIn, fp) = (r.getLong(6), r.getLong(7), r.getDouble(8))
    assert(m == (nKeys * 8 + 63) / 64 * 64, "8 bits/key, word-aligned")
    assert(presentIn == nPresent, "Bloom filters never false-negative")
    assert(nBits > 0 && nBits <= math.min(m, 4L * nKeys),
      "bit count bounded by k*n and m")
    assert(fp == absentIn.toDouble / nAbsent.toDouble)
    // data-sized m keeps fill ~0.39 at EVERY fixture, so this bound
    // holds regardless of which sfDir the suite points at
    assert(fp < 0.5, s"fp rate $fp implausible for fill ${nBits.toDouble / m}")
    val again = ScaleOps.bloomFilter(spark, sfDir).collect().head
    assert(again.getString(3) == digest && again.getLong(2) == nBits,
      "rebuild is bit-identical")
  }

  test("buildBloom: word-OR aggregate build == position-set semantics; membership never false-negatives") {
    val (m, words) = ScaleOps.buildBloom(customer, "c_custkey")
    assert(m % 64 == 0 && words.length == (m / 64).toInt,
      "word-aligned filter, one long per word")
    // the digest representation: distinct positions from the SAME shared
    // hash recipe — the production words must carry exactly these bits
    val posSet = customer
      .select(col("c_custkey").cast("string").as("kstr")).distinct()
      .select(col("kstr"), explode(sequence(lit(0), lit(3))).as("i"))
      .select(pmod(graft.functions.HashExprs.md5Uint32(
        concat(col("kstr"), lit(":"), col("i").cast("string"))), lit(m)).as("pos"))
      .distinct().collect().map(_.getLong(0)).toSet
    val wordBits = words.zipWithIndex.flatMap { case (w, wi) =>
      (0 until 64).filter(b => ((w >>> b) & 1L) == 1L).map(b => wi * 64L + b)
    }.toSet
    assert(wordBits == posSet, "word OR-merge drifted from position-set semantics")
    // zero false negatives through the broadcast membership predicate
    val fn = customer
      .where(!ScaleOps.bloomMightContain(m, words, 4, col("c_custkey"))).count()
    assert(fn == 0, s"$fn false negatives")
    // absent probes (shifted past the key domain) mostly rejected:
    // expected fp ~2.4% at 8 bits/key; 0.15 leaves seed room at sf0.001
    val n = customer.count()
    val maxKey = customer.agg(max("c_custkey")).head().getLong(0)
    val fpN = customer
      .select((col("c_custkey") + lit(maxKey + 1)).as("p"))
      .where(ScaleOps.bloomMightContain(m, words, 4, col("p"))).count()
    assert(fpN.toDouble / n <= 0.15, s"fp rate ${fpN.toDouble / n}")
  }

  test("buildBloom: an over-ceiling filter fails loudly instead of OOMing the driver") {
    // the fixture's distinct keys at 8 bits/key need more than 64 bits,
    // so a 64-bit ceiling must trip the guard BEFORE any O(m) collect
    val e = intercept[IllegalArgumentException] {
      ScaleOps.buildBloom(customer, "c_custkey", maxBits = 64L)
    }
    assert(e.getMessage.contains("driver ceiling"), e.getMessage)
    // and the production ceiling is the documented constant
    assert(ScaleOps.maxBloomBits == (1L << 33))
  }
}
