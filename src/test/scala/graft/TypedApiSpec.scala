package graft

import org.apache.spark.sql.functions._

// encoders need top-level case classes (inner classes lack a stable
// outer scope for Catalyst's NewInstance)
case class TypedOrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
case class TypedCustomer(c_custkey: Long, c_name: String, c_mktsegment: String)

/** The typed Dataset surface (SURVEY §1.4): case-class Encoders,
  * typed transforms, typed joins — compile-time field checks where they
  * help, with results equal to the untyped plans.
  */
class TypedApiSpec extends SparkTestBase {
  import spark.implicits._
  type Order = TypedOrder
  type Customer = TypedCustomer

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice").as[Order]
  private lazy val customers = spark.read.parquet(s"$sfDir/customer.parquet")
    .select("c_custkey", "c_name", "c_mktsegment").as[Customer]

  test("typed filter/map agree with the untyped plan") {
    val typed = orders.filter(_.o_totalprice > 100000.0).map(_.o_orderkey)
      .collect().sorted.toSeq
    val untyped = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_totalprice") > 100000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(typed == untyped && typed.nonEmpty)
  }

  test("joinWith yields typed pairs matching the untyped join") {
    val pairs = orders.joinWith(customers,
        orders("o_custkey") === customers("c_custkey"), "inner")
      .map { case (o, c) => (o.o_orderkey, c.c_mktsegment) }
      .collect().sorted.toSeq
    val untyped = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(pairs == untyped && pairs.nonEmpty)
  }

  test("groupByKey + mapGroups computes per-key aggregates") {
    val maxPerCust = orders.groupByKey(_.o_custkey)
      .mapGroups((k: Long, os: Iterator[Order]) => (k, os.map(_.o_totalprice).max))
      .collect().toMap
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey").agg(max("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(maxPerCust == expected)
  }

  test("cogroup pairs both sides' groups, including keys present on only one side") {
    // per custkey: (#orders, #customer rows) — cogroup sees each side's
    // full iterator even when the other is empty, unlike any join.
    // Orders restricted to even custkeys so odd-key customers prove the
    // empty-side case (every fixture customer otherwise has orders)
    val evenOrders = orders.filter(_.o_custkey % 2 == 0)
    val cg = customers.groupByKey(_.c_custkey)
      .cogroup(evenOrders.groupByKey(_.o_custkey)) {
        (k: Long, cs: Iterator[Customer], os: Iterator[Order]) =>
          Iterator((k, cs.size.toLong, os.size.toLong))
      }
      .collect().map { case (k, nc, no) => k -> ((nc, no)) }.toMap
    val expected = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("k")).groupBy("k").count()
      .withColumnRenamed("count", "nc")
      .join(spark.read.parquet(s"$sfDir/orders.parquet")
          .where(col("o_custkey") % 2 === 0)
          .select(col("o_custkey").as("k")).groupBy("k").count()
          .withColumnRenamed("count", "no"),
        Seq("k"), "full_outer")
      .na.fill(0L, Seq("nc", "no"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cg == expected)
    assert(cg.values.exists(_._2 == 0L),
      "fixture has customers with zero orders - the side joins cannot model")
  }
}
