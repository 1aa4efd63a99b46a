package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.TrainingPipeline

/** The end-to-end corpus pipeline: planted duplicates die, counts fall
  * monotonically through the stages, splits partition the clean corpus
  * exactly, and a re-run reproduces identical outputs.
  */
class TrainingPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("pipeline: planted dups die, counts monotone, splits exact, deterministic") {
    // plant an exact duplicate (same text, higher id — min-id keep-one
    // must keep the original) and a trivial near-duplicate
    val base = docs.limit(200)
    val donor = base.orderBy("doc_id").limit(1).collect().head
    val exactDup = Seq((900001L, donor.getAs[String]("text"),
      donor.getAs[String]("lang"), donor.getAs[String]("source"),
      donor.getAs[Long]("n_chars")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val nearDup = Seq((900002L, donor.getAs[String]("text") + " tail token",
      donor.getAs[String]("lang"), donor.getAs[String]("source"),
      donor.getAs[Long]("n_chars") + 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = base.unionByName(exactDup).unionByName(nearDup)

    val out = Files.createTempDirectory("graft-pipeline").toString
    val r = TrainingPipeline.run(corpus, out)

    assert(r.input == 202L)
    assert(r.afterQuality <= r.input)
    assert(r.afterExactDedup < r.afterQuality, "planted exact dup must die")
    assert(r.afterNearDup < r.afterExactDedup, "planted near dup must die")
    assert(r.afterSample <= r.afterNearDup)
    assert(r.trainDocs + r.valDocs + r.testDocs == r.afterSample,
      "splits must partition the clean corpus exactly")
    assert(r.batches >= 1 && r.batches <= r.trainDocs)

    // planted ids are gone; the donor doc survived dedup
    val cleanIds = spark.read.parquet(s"$out/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!cleanIds(900001L) && !cleanIds(900002L))

    // train shards carry a batch assignment and no split leakage
    val trainIds = spark.read.parquet(s"$out/train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val valIds = spark.read.parquet(s"$out/val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.intersect(valIds).isEmpty)

    // determinism: a second run over the same input reproduces the
    // report and the exact train membership
    val out2 = Files.createTempDirectory("graft-pipeline2").toString
    val r2 = TrainingPipeline.run(corpus, out2)
    assert(r2 == r)
    val trainIds2 = spark.read.parquet(s"$out2/train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds2 == trainIds)
  }

  test("pipeline: empty corpus flows through without error") {
    val empty = docs.where(lit(false))
    val out = Files.createTempDirectory("graft-pipeline-empty").toString
    val r = TrainingPipeline.run(empty, out)
    assert(r.input == 0L && r.afterSample == 0L && r.batches == 0L)
  }
}
