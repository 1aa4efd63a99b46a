package graft

import org.apache.spark.sql.functions._

import graft.engine.{CuratedQuery, SchemaDdl, Serving}

/** Serving sinks: catalog saveAsTable round-trip (S5), JDBC full-replace
  * against an embedded Derby database (S6), and object-store glob
  * listing / latest-key selection (S9).
  */
class ServingSpec extends SparkTestBase {

  private lazy val curated = SchemaDdl.conform(CuratedQuery.curatedQuery(spark, sfDir))

  test("S5: saveAsTable round-trip + catalog count validation") {
    Serving.saveCatalogTable(curated, "graft_curated_test")
    try {
      assert(spark.catalog.tableExists("graft_curated_test"))
      assert(Serving.catalogCount(spark, "graft_curated_test") == curated.count())
      // catalog re-infers the parquet schema (the Glue-crawler behavior)
      val back = spark.table("graft_curated_test")
      assert(back.schema.fieldNames.toSeq == curated.schema.fieldNames.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_curated_test")
    }
  }

  test("S6: JDBC overwrite is a full replace, validated by count (embedded Derby)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    // Derby cannot store the query's CLOB-mapped strings with parquet
    // stats; keep the sink payload to the typed columns - the reference
    // loads the full curated table into Postgres, which the Derby dialect
    // also supports, but CLOB comparisons are driver-specific noise.
    val payload = curated.select(
      col("CustomerKey"), col("OrderQuantity"), col("AnnualIncome"),
      col("OrderDate"), col("ReturnQuantity"))
    Serving.jdbcOverwrite(payload, url, "curated_jdbc")
    assert(Serving.jdbcCount(spark, url, "curated_jdbc") == payload.count())
    // overwrite again: full replace (to_sql if_exists='replace'), not append
    Serving.jdbcOverwrite(payload, url, "curated_jdbc")
    assert(Serving.jdbcCount(spark, url, "curated_jdbc") == payload.count())
    // values survive the round-trip
    val back = spark.read.jdbc(url, "curated_jdbc", new java.util.Properties())
    assert(back.where(col("CustomerKey") === 11000)
      .select(sum(col("OrderQuantity"))).head().getLong(0) ==
      payload.where(col("CustomerKey") === 11000)
        .select(sum(col("OrderQuantity"))).head().getLong(0))
  }

  test("S9: glob listing senses keys; latest key is deterministic max") {
    val keys = Serving.listKeys(spark, s"${CuratedQuery.fixtureDir}/*.csv")
    assert(keys.length == 8)
    assert(Serving.keyExists(spark, s"${CuratedQuery.fixtureDir}/AdventureWorks_*.csv"))
    assert(!Serving.keyExists(spark, s"${CuratedQuery.fixtureDir}/nope_*.csv"))
    assert(Serving.latestKey(spark, s"${CuratedQuery.fixtureDir}/*.csv")
      .exists(_.endsWith("AdventureWorks_Sales_2017.csv")))
  }
}
