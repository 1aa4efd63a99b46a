package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink formats beyond parquet+csv: JSON-lines and ORC
  * round-trips preserve rows and schemas.
  */
class SourcesSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "text")

  test("JSON-lines round-trip preserves rows") {
    val tmp = Files.createTempDirectory("graft-json").toString
    docs.write.mode("overwrite").json(s"$tmp/docs_json")
    val back = spark.read.json(s"$tmp/docs_json")
      .select("doc_id", "lang", "text") // json source orders columns alphabetically
    assert(back.count() == docs.count())
    val a = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val b = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(a == b)
  }

  test("ORC round-trip preserves rows and schema") {
    val tmp = Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(s"$tmp/docs_orc")
    val back = spark.read.orc(s"$tmp/docs_orc")
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.agg(sum(length(col("text")))).head().getLong(0) ==
      docs.agg(sum(length(col("text")))).head().getLong(0))
  }
}
