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

  test("mergeSchema unions evolving parquet schemas; old files read NULL for new columns") {
    val tmp = Files.createTempDirectory("graft-evolve").toString
    // epoch 1: (doc_id, lang); epoch 2 adds quality — the additive
    // evolution a long-lived lake table accretes
    docs.select("doc_id", "lang").where(col("doc_id") < 100)
      .write.parquet(s"$tmp/t/epoch=1")
    docs.select(col("doc_id"), col("lang"),
        (length(col("text")) % 10).as("quality"))
      .where(col("doc_id") >= 100 && col("doc_id") < 200)
      .write.parquet(s"$tmp/t/epoch=2")
    val back = spark.read.option("mergeSchema", "true").parquet(s"$tmp/t")
    assert(back.columns.toSet == Set("doc_id", "lang", "quality", "epoch"))
    // old rows surface the new column as NULL, not an error
    assert(back.where(col("epoch") === 1 && col("quality").isNotNull).count() == 0)
    assert(back.where(col("epoch") === 2 && col("quality").isNull).count() == 0)
    assert(back.count() == docs.where(col("doc_id") < 200).count())
  }

  test("malformed CSV rows: PERMISSIVE keeps them with _corrupt_record, DROPMALFORMED drops") {
    val tmp = Files.createTempDirectory("graft-corrupt").toString
    val f = new java.io.File(s"$tmp/in.csv")
    val w = new java.io.PrintWriter(f)
    // row 3 has a non-numeric id, row 4 too few columns
    w.write("id,name,score\n1,alpha,10\n2,beta,20\nX,gamma,30\n4,delta\n5,eps,50\n")
    w.close()
    val schema = "id INT, name STRING, score INT, _corrupt_record STRING"
    val permissive = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(s"$tmp/in.csv").cache()
    assert(permissive.count() == 5, "PERMISSIVE keeps every physical row")
    // both the unparseable-id row AND the too-few-columns row keep
    // their raw line in _corrupt_record...
    assert(permissive.where(col("_corrupt_record").isNotNull).count() == 2)
    // ...while the fields that DID parse still surface alongside it
    assert(permissive.where(col("id") === 4 && col("score").isNull &&
      col("_corrupt_record").isNotNull).count() == 1)
    val dropped = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema("id INT, name STRING, score INT").csv(s"$tmp/in.csv")
    assert(dropped.where(col("id").isNull).count() === 0,
      "DROPMALFORMED yields no half-parsed rows")
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
