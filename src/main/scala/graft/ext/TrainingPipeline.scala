package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** End-to-end training-corpus pipeline — the composition a user of this
  * library ships: redact → quality-gate → exact-dedup → near-dup
  * keep-one → weighted sample → materialize the clean corpus →
  * split → pack the train split → sharded write.
  *
  * Structure at 100 TB:
  *  - Stages 1–5 build ONE lazy plan materialized by a single parquet
  *    write of the cleaned corpus (the intermediate a lakehouse keeps
  *    as an asset anyway). The only inherent extra passes are the ones
  *    the algorithms need (the outlier-stats aggregation, near-dup
  *    pair generation, the CC rounds, the pack's two-pass prefix sum).
  *  - The report's intermediate counts are explicit jobs (one count per
  *    stage). `Dataset.observe` can NOT thread through these stages:
  *    exact-dedup and near-dup-removal reference their input twice
  *    (self-joins), and a CollectMetrics node duplicated in one plan is
  *    an analysis error. Output counts (train/val/test/batches) read
  *    parquet metadata, not data.
  *  - Splits re-read the materialized corpus, so the train/val/test
  *    writes scan the CLEANED data (≤ input), not the raw corpus
  *    three times.
  *  - Every stage is a pure function of content (md5/minhash of ids
  *    and text) — re-running the pipeline on the same input reproduces
  *    identical outputs, and task retries cannot flip a doc's fate
  *    mid-job.
  */
object TrainingPipeline {

  /** @param minTokens      row-local quality floor (drop near-empty docs)
    * @param maxAbsZ        per-language length z-score cut (corpus-level)
    * @param nearDupThreshold verified-Jaccard threshold for keep-one
    * @param sampleCap      [[TrainingPrep.weightedKeep]] length cap
    * @param packBudget     tokens per training batch
    * @param numShards      train-split shard files
    */
  final case class Config(
      minTokens: Int = 5,
      maxAbsZ: Double = 3.0,
      nearDupThreshold: Double = 0.5,
      sampleCap: Long = 1000L,
      packBudget: Int = 512,
      numShards: Int = 4)

  final case class Report(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDup: Long,
      afterSample: Long,
      trainDocs: Long,
      valDocs: Long,
      testDocs: Long,
      batches: Long)

  /** Run the pipeline over a corpus with columns
    * (doc_id, text, lang, source, n_chars); writes
    * `outDir/clean` (the surviving corpus), `outDir/val`, `outDir/test`,
    * and `outDir/train` (range-partitioned shards with batch_id).
    */
  def run(docs: DataFrame, outDir: String, cfg: Config = Config()): Report = {
    graft.functions.HashExprs.register(docs.sparkSession)

    // -- stages 1–2: redact + row-local and corpus-level quality gates --
    val redacted = docs.withColumn("text", Cleaning.redactPii(col("text")))
    val rowLocal = redacted.where(
      size(split(TextOps.normalizeText(col("text")), " ")) >= cfg.minTokens)
    // the per-language stats aggregation is the inherent second pass;
    // the removal list it yields is tiny → broadcast anti-join
    val quality = rowLocal
      .join(broadcast(
        Cleaning.outlierFlags(rowLocal.select("doc_id", "lang", "n_chars"))
          .where(abs(col("z")) > cfg.maxAbsZ)
          .select(col("doc_id"))), Seq("doc_id"), "left_anti")

    // -- stage 3: exact dedup on the normalized text hash (min id wins).
    // A window over the high-cardinality hash key, not groupBy+semi-join:
    // one shuffle and no self-join.
    val w = Window.partitionBy("__th").orderBy("doc_id")
    val exact = quality
      .withColumn("__th", xxhash64(TextOps.normalizeText(col("text"))))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__th", "__rn")

    // -- stage 4: near-dup keep-one over the MinHash+LSH cluster graph --
    // pair generation re-scans the (already reduced) corpus — inherent
    // to LSH, bounded by the bucketed candidate space, never N².
    val pairs = Dedup.minhashNearDupPairs(exact, "text", "doc_id",
      threshold = cfg.nearDupThreshold, sorted = false)
    val removed = Dedup.connectedComponents(pairs.select("id1", "id2"))
      .where(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val nearDeduped = exact.join(broadcast(removed), Seq("doc_id"), "left_anti")

    // -- stage 5: quality-weighted sample + materialize the clean corpus --
    val sampled = nearDeduped.where(TrainingPrep.weightedKeep(cfg.sampleCap))
    sampled.write.mode("overwrite").parquet(s"$outDir/clean")

    // -- stages 6–8: split the materialized corpus, pack, shard ----------
    val spark = docs.sparkSession
    val clean = spark.read.parquet(s"$outDir/clean")
      .withColumn("split", TrainingPrep.splitCol)
    clean.where(col("split") === "val").drop("split")
      .write.mode("overwrite").parquet(s"$outDir/val")
    clean.where(col("split") === "test").drop("split")
      .write.mode("overwrite").parquet(s"$outDir/test")

    val train = clean.where(col("split") === "train").drop("split")
    val packed = train.join(
      TrainingPrep.sequencePack(train, cfg.packBudget)
        .select("doc_id", "batch_id"), Seq("doc_id"))
    TrainingPrep.writeTrainingShards(packed, s"$outDir/train", cfg.numShards)

    val Seq(trainN, valN, testN) = Seq("train", "val", "test").map(s =>
      spark.read.parquet(s"$outDir/$s").count())
    val batches = spark.read.parquet(s"$outDir/train")
      .agg(countDistinct(col("batch_id"))).head().getLong(0)

    Report(
      input = docs.count(),
      afterQuality = quality.count(),
      afterExactDedup = exact.count(),
      afterNearDup = nearDeduped.count(),
      afterSample = spark.read.parquet(s"$outDir/clean").count(),
      trainDocs = trainN, valDocs = valN, testDocs = testN,
      batches = batches)
  }
}
