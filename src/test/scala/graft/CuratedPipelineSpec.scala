package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.{CuratedQuery, SchemaDdl}

/** Golden end-to-end test of the reference pipeline on the committed
  * AdventureWorks fixtures: 8× CSV→Parquet → view registry → the literal
  * 34-column QUERY → cache → coalesce(1) parquet (SURVEY §5.2 item 4).
  */
class CuratedPipelineSpec extends SparkTestBase {

  test("CSV->Parquet->curated pipeline: schema pins to the Redshift DDL") {
    val tmp = Files.createTempDirectory("graft-curated").toString
    val df = CuratedQuery.runPipeline(spark, CuratedQuery.fixtureDir,
      s"$tmp/processing", s"$tmp/curated")

    // compare name/type/order; a non-nullable column satisfies a nullable
    // DDL column (NVL makes ReturnQuantity non-null by construction)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    val conformed = SchemaDdl.conform(df)
    assert(shape(conformed.schema) == shape(SchemaDdl.curatedSchema),
      s"schema drift vs Redshift DDL:\n${conformed.schema.treeString}")
    // the query's own casts already produce the DDL types - conform must
    // be a no-op on types, not a repair
    assert(shape(df.schema) == shape(SchemaDdl.curatedSchema))

    // single-file parquet out (coalesce(1), csv-to-parquet.py:46)
    val files = new java.io.File(s"$tmp/curated").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, "curated zone must hold exactly one parquet file")

    // written parquet round-trips identically
    val back = spark.read.parquet(s"$tmp/curated")
    assert(back.count() == df.count())
  }

  test("curated golden rows: joins, date parse, currency, NVL") {
    val out = CuratedQuery.curatedQuery(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == 11) // 8 sales rows, fanned out by the Returns join

    // first row: 1/1/2015 order by customer 11000 for product 214 in
    // territory 4, which has two Returns rows -> both ReturnDates appear
    val first = out.where(col("CustomerKey") === 11000 && col("OrderDate") === lit("2015-01-01").cast("date"))
      .orderBy(col("ReturnDate").asc_nulls_first).collect()
    assert(first.length == 2)
    assert(first.map(_.getAs[Int]("ReturnQuantity")).toSeq.sorted == Seq(1, 2))
    val r0 = first.head
    assert(r0.getAs[Double]("AnnualIncome") == 90000.0) // "$90,000" cleaned
    assert(r0.getAs[String]("CategoryName") == "Accessories")
    assert(r0.getAs[java.sql.Date]("BirthDate").toString == "1966-04-08")

    // unknown customer 99999: all customer columns NULL, ReturnQuantity
    // NVL-defaults to 0 (no Returns match either)
    val miss = out.where(col("CustomerKey") === 99999).collect()
    assert(miss.length == 1)
    assert(miss.head.getAs[Any]("FirstName") == null)
    assert(miss.head.getAs[Int]("ReturnQuantity") == 0)
  }
}
