package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.engine.{GraftSession, Tables}
import graft.functions.TextOps

/** Deduplication for training-data pipelines (north-star Tier B):
  * exact (hash-groupBy), MinHash+LSH near-dup, SimHash, and n-gram
  * Jaccard.
  *
  * 100 TB design: signatures (minhash, simhash, md5) are computed
  * row-local with codegen'd higher-order functions — zero shuffle, no
  * driver collect. Candidate generation shuffles only on
  * (band_id, band_hash) buckets, so no O(N²) comparison and no global
  * sort ever happens; exact similarity is verified only within buckets.
  * Skewed buckets (a band hash shared by a huge near-dup cluster) are
  * handled by AQE skew-join splitting (enabled in GraftSession).
  */
object Dedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(GraftSession.tuned(s), dir, n)

  // ---- exact ----------------------------------------------------------

  /** Exact dedup by content hash: one representative (min id) per
    * distinct normalized text + multiplicity. Equivalent to
    * dropDuplicates but with a deterministic survivor.
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_doc_id")

  /** DISTINCT on a projection (dropDuplicates semantics). */
  def distinctKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  // ---- MinHash + LSH ---------------------------------------------------

  /** doc_id + distinct word-level n-gram shingles of the normalized text.
    * Everything is row-local (no shuffle).
    */
  def shingleSets(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .withColumn("toks", split(TextOps.normalizeText(col(textCol)), " "))
      .withColumn("shingles", expr(
        s"""CASE WHEN size(toks) >= $n
           |  THEN array_distinct(transform(sequence(1, size(toks) - $n + 1),
           |                                i -> concat_ws(' ', slice(toks, i, $n))))
           |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .drop("toks")

  /** MinHash signature: sig[s] = min over shingles of xxhash64(s, shingle).
    * Computed per-row with nested higher-order functions — no explode, no
    * shuffle, stays in whole-stage codegen.
    */
  def withMinhashSignature(shingled: DataFrame, numHashes: Int): DataFrame =
    shingled.withColumn("sig", expr(
      s"""transform(sequence(1, $numHashes),
         |          s -> array_min(transform(shingles, sh -> xxhash64(s, sh))))""".stripMargin))

  /** Explode the signature into LSH bands: a pair agreeing on ALL rows of
    * any band becomes a candidate. band_hash = xxhash64 over the band
    * slice of the signature.
    */
  def lshBands(signed: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    signed
      .select(col(idCol), expr(
        s"""explode(transform(sequence(0, ${bands - 1}),
           |  b -> struct(b AS band_id,
           |              xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)) AS band_hash)))
           |""".stripMargin).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))

  /** Candidate pairs = ids sharing any (band_id, band_hash) bucket. */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val l = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id1"))
    val r = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id2"))
    l.join(r, Seq("band_id", "band_hash"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Full MinHash→LSH→verify pipeline: candidate pairs with their EXACT
    * shingle-set Jaccard (computed only inside buckets), thresholded.
    */
  def minhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 2, numHashes: Int = 16, bands: Int = 8,
      threshold: Double = 0.2): DataFrame = {
    val shingled = shingleSets(docs, textCol, shingleN)
      .where(size(col("shingles")) > 0)
    val signed = withMinhashSignature(shingled, numHashes)
    val cand = candidatePairs(
      lshBands(signed, idCol, bands, numHashes / bands), idCol)
    val sets = shingled.select(col(idCol), col("shingles"))
    cand
      .join(sets.withColumnRenamed(idCol, "id1").withColumnRenamed("shingles", "sh1"), "id1")
      .join(sets.withColumnRenamed(idCol, "id2").withColumnRenamed("shingles", "sh2"), "id2")
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("id1", "id2")
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash of a token array: bit i of the result is 1 iff the
    * sum over tokens of ±1 (sign of bit i of xxhash64(token)) is > 0.
    * Row-local, codegen'd.
    */
  def simhash64(tokens: String): Column = expr(
    s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) -> acc +
       |  CASE WHEN aggregate($tokens, CAST(0 AS BIGINT),
       |         (a, t) -> a + CASE WHEN (shiftright(xxhash64(t), i) & 1) = 1 THEN 1 ELSE -1 END) > 0
       |       THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)""".stripMargin)

  def withSimhash(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("toks", split(TextOps.normalizeText(col(textCol)), " "))
      .withColumn("simhash", simhash64("toks"))
      .drop("toks")

  /** Near-dup pairs by SimHash: block on 4×16-bit chunks (any pair within
    * Hamming distance ≤ 3·16 shares ≥1 chunk... in practice pairs with
    * distance ≤ maxHamming are found when they agree on some chunk), then
    * verify exact Hamming distance via bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 16): DataFrame = {
    val hashed = withSimhash(docs, textCol).select(col(idCol), col("simhash"))
    val chunked = hashed.select(
      col(idCol), col("simhash"),
      expr("explode(transform(sequence(0, 3), b -> struct(b AS chunk_id, (shiftright(simhash, b * 16) & 65535) AS chunk)))").as("c"))
      .select(col(idCol), col("simhash"), col("c.chunk_id"), col("c.chunk"))
    val l = chunked.select(col("chunk_id"), col("chunk"),
      col(idCol).as("id1"), col("simhash").as("h1"))
    val r = chunked.select(col("chunk_id"), col("chunk"),
      col(idCol).as("id2"), col("simhash").as("h2"))
    l.join(r, Seq("chunk_id", "chunk"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("id1", "id2")
  }

  // ---- registered queries ----------------------------------------------

  def minhashQuery(s: SparkSession, dir: String): DataFrame =
    minhashNearDupPairs(t(s, dir, "documents"), "text", "doc_id")

  def simhashQuery(s: SparkSession, dir: String): DataFrame =
    simhashPairs(t(s, dir, "documents"), "text", "doc_id")

  /** Oracle-checkable n-gram Jaccard: similarity of each doc with its
    * successor (deterministic pairing; DuckDB list functions replicate).
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(t(s, dir, "documents"), "text", 2)
      .select(col("doc_id"), col("shingles"))
    val a = sets.select(col("doc_id").as("id1"), col("shingles").as("sh1"))
    val b = sets.select(col("doc_id").as("id2"), col("shingles").as("sh2"))
    a.join(b, col("id2") === col("id1") + 1)
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .orderBy("id1")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_dedup_exact", "exact dedup via content-hash groupBy",
      exactDedup,
      Some(
        """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_dups
          |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin)),
    GraftQuery("q_dedup_distinct", "DISTINCT projection (dropDuplicates)",
      distinctKeys,
      Some(
        """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    GraftQuery("q_minhash_neardup", "MinHash+LSH near-dup candidate pairs w/ exact Jaccard verify",
      minhashQuery, None),
    GraftQuery("q_simhash_neardup", "SimHash 64-bit near-dup pairs (chunk-blocked)",
      simhashQuery, None),
    GraftQuery("q_ngram_jaccard", "bigram-shingle Jaccard of successive docs",
      ngramJaccard,
      Some(
        """WITH sets AS (
          |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 2
          |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
          |    ELSE [] END) AS shingles
          |  FROM (SELECT doc_id,
          |          string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
          |        FROM documents)
          |)
          |SELECT a.doc_id AS id1, b.doc_id AS id2,
          |       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
          |       len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
          |FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
          |ORDER BY id1""".stripMargin)),
  )
}
