package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.engine.{GraftSession, Tables}
import graft.functions.TextOps

/** Deduplication for training-data pipelines (north-star Tier B):
  * exact (hash-groupBy), DISTINCT, keep-latest, approximate distinct,
  * MinHash+LSH near-dup, SimHash, and n-gram Jaccard.
  *
  * 100 TB design: signatures (minhash, simhash, md5) are computed
  * row-local by native codegen'd Catalyst expressions
  * ([[graft.functions.HashExprs]]) — zero shuffle, no driver collect.
  * Candidate generation shuffles only on (band_id, band_hash) /
  * (chunk_id, chunk) buckets, so no O(N²) comparison and no global sort
  * ever happens; exact similarity is verified only within buckets and
  * only for prefilter survivors. Degenerate buckets are capped
  * (simhashPairs) and skewed joins split by AQE (GraftSession).
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

  /** Keep-latest dedup: one survivor per key, chosen by recency — the
    * "newest version of each document" policy (vs [[exactDedup]]'s
    * deterministic min-id survivor). One window shuffle on the key.
    */
  def keepLatest(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("latest_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("latest_ts"),
        col("event_type").as("latest_type"))
      .orderBy("user_id")
  }

  /** HLL++ approximate distinct count next to the exact count. The
    * sketch value is engine-specific (DuckDB's approx algorithm differs
    * bit-for-bit), so this key is rows-only in the driver gate; the unit
    * suite bounds its relative error against the exact count. At 100 TB
    * this is THE distinct-count operator: constant memory per partition,
    * mergeable, no giant shuffle of distinct keys.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))

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

  /** MinHash signature via the native codegen'd [[graft.functions.MinHashSigExpr]]
    * (one string-hash per shingle, k long-remixes — a tight JVM loop per
    * row instead of interpreted HOF lambdas). Row-local: no explode, no
    * shuffle.
    */
  def withMinhashSignature(shingled: DataFrame, numHashes: Int): DataFrame =
    shingled.withColumn("sig", expr(s"graft_minhash_sig(shingles, $numHashes)"))

  /** Explode the signature into LSH bands: a pair agreeing on ALL rows of
    * any band becomes a candidate. band_hash = xxhash64 over the band
    * slice of the signature. The full signature rides along so candidate
    * pairs can be prefiltered by estimated Jaccard without re-joining.
    */
  def lshBands(signed: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    signed
      .select(col(idCol), col("sig"), expr(
        s"""explode(transform(sequence(0, ${bands - 1}),
           |  b -> struct(b AS band_id,
           |              xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)) AS band_hash)))
           |""".stripMargin).as("band"))
      .select(col(idCol), col("sig"), col("band.band_id"), col("band.band_hash"))

  /** Candidate pairs = ids sharing any (band_id, band_hash) bucket,
    * prefiltered by the MinHash Jaccard ESTIMATE (fraction of agreeing
    * signature rows — unbiased estimator of Jaccard) so the expensive
    * exact-verify join only sees plausible pairs, then deduped. At scale
    * the wide data (signatures) is dropped before the distinct shuffle.
    */
  def candidatePairs(bandsDf: DataFrame, idCol: String, numHashes: Int,
      minEstJaccard: Double): DataFrame = {
    val l = bandsDf.select(col("band_id"), col("band_hash"),
      col(idCol).as("id1"), col("sig").as("sig1"))
    val r = bandsDf.select(col("band_id"), col("band_hash"),
      col(idCol).as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band_id", "band_hash"))
      .where(col("id1") < col("id2"))
      .where(expr(
        s"""size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b))
           |  >= CAST(ceil($minEstJaccard * $numHashes) AS INT)""".stripMargin))
      .select("id1", "id2")
      .distinct()
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** doc_id + DISTINCT hashed word-level n-gram shingles, via the native
    * codegen'd [[graft.functions.ShingleHashExpr]]. The shingle STRINGS
    * are never materialized — dedup only ever consumes their hashes
    * (signatures and set-overlap verification), and the HOF string
    * construction (slice+concat_ws per window) was the single largest
    * cost in the round-1 bench.
    */
  def hashedShingleSets(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    docs
      .withColumn("toks", split(TextOps.normalizeText(col(textCol)), " "))
      .withColumn("shs", expr(s"graft_shingle_hashes(toks, $n)"))
      .where(size(col("shs")) > 0)
      .select(col(idCol), col("shs"))

  /** Full MinHash→LSH→verify pipeline: candidate pairs with their EXACT
    * shingle-set Jaccard, thresholded.
    *
    * Scale shape: shingle hashes/signatures/bands are row-local native
    * expressions (one scan, whole-stage codegen); the only shuffles are
    * the (band_id, band_hash) bucket join, a narrow (id1, id2) distinct,
    * and the survivor-only verify join. The verify join carries hashed
    * shingle sets (array<long>) — same Jaccard up to xxhash64 collisions
    * (negligible), a fraction of the raw-string shuffle bytes. 4
    * rows/band makes a band match already mean sig-agreement^4, and the
    * estimated-Jaccard prefilter (sig agreement fraction ≥ threshold)
    * kills the remaining candidate flood before anything wide moves.
    */
  def minhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 2, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.2): DataFrame = {
    val sets = hashedShingleSets(docs, textCol, idCol, shingleN)
    val signed = sets.withColumn("sig", expr(s"graft_minhash_sig(shs, $numHashes)"))
    val cand = candidatePairs(
      lshBands(signed.drop("shs"), idCol, bands, numHashes / bands), idCol,
      numHashes, minEstJaccard = threshold)
    cand
      .join(sets.withColumnRenamed(idCol, "id1").withColumnRenamed("shs", "sh1"), "id1")
      .join(sets.withColumnRenamed(idCol, "id2").withColumnRenamed("shs", "sh2"), "id2")
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("id1", "id2")
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash of the token column: bit i of the result is 1 iff
    * more than half the token hashes have bit i set (the classic ±1 vote
    * sum > 0). Computed by the native codegen'd
    * [[graft.functions.SimHash64Expr]] — one string-hash + 64 bit-adds
    * per token in a tight JVM loop. (SQL HOF formulations evaluate an
    * interpreted lambda per token×bit and were 10-50× slower.)
    */
  def withSimhash(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("toks", split(TextOps.normalizeText(col(textCol)), " "))
      .withColumn("simhash", expr("graft_simhash64(toks)"))
      .drop("toks")

  /** Near-dup pairs by SimHash with an EXACT recall guarantee: the 64-bit
    * hash is blocked on `maxHamming + 1` equal-width chunks, so any pair
    * within Hamming distance ≤ maxHamming shares at least one chunk
    * (pigeonhole). Verification (bit_count of xor) runs inside buckets
    * only; the hamming filter runs BEFORE the pair-dedup distinct so the
    * shuffle carries survivors, not the candidate flood.
    *
    * Scale guard: buckets larger than `maxBucket` (degenerate chunks —
    * boilerplate/empty docs sharing a chunk value) are dropped from
    * candidate generation via a broadcast anti-join; at 100 TB this caps
    * the O(bucket²) pairing. Dropped buckets are a documented recall
    * trade: pairs found ONLY through a dropped chunk are missed.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15, "chunks need >= 4 bits")
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val mask = (1L << bits) - 1
    val hashed = withSimhash(docs, textCol).select(col(idCol), col("simhash"))
    val chunked = hashed.select(
      col(idCol), col("simhash"),
      expr(s"explode(transform(sequence(0, ${chunks - 1}), b -> struct(b AS chunk_id, (shiftright(simhash, b * $bits) & $mask) AS chunk)))").as("c"))
      .select(col(idCol), col("simhash"), col("c.chunk_id"), col("c.chunk"))
    val oversized = chunked.groupBy("chunk_id", "chunk")
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucket)
    val pruned = chunked.join(broadcast(oversized), Seq("chunk_id", "chunk"), "left_anti")
    val l = pruned.select(col("chunk_id"), col("chunk"),
      col(idCol).as("id1"), col("simhash").as("h1"))
    val r = pruned.select(col("chunk_id"), col("chunk"),
      col(idCol).as("id2"), col("simhash").as("h2"))
    l.join(r, Seq("chunk_id", "chunk"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("id1", "id2")
  }

  // ---- registered queries ----------------------------------------------

  def minhashQuery(s: SparkSession, dir: String): DataFrame =
    minhashNearDupPairs(t(s, dir, "documents"), "text", "doc_id")

  def simhashQuery(s: SparkSession, dir: String): DataFrame =
    simhashPairs(t(s, dir, "documents"), "text", "doc_id")

  /** Generator null-semantics: explode_outer preserves rows whose array
    * is empty (as a NULL element) where explode would drop them — the
    * difference between "docs with no 40-gram" disappearing from a
    * report and showing up as NULL. 40-token shingles make both cases
    * non-empty on this corpus (doc lengths straddle 40 tokens).
    */
  def explodeOuter(s: SparkSession, dir: String): DataFrame =
    shingleSets(t(s, dir, "documents"), "text", 40)
      .select(col("doc_id"), explode_outer(col("shingles")).as("gram40"))
      .orderBy(col("doc_id"), col("gram40").asc_nulls_first)

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
    GraftQuery("q_dedup_latest", "keep-latest-per-key dedup (newest-version survivor policy)",
      keepLatest,
      Some(
        """SELECT user_id, event_id AS latest_event_id,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS latest_ts,
          |       event_type AS latest_type
          |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |      FROM events)
          |WHERE rn = 1 ORDER BY user_id""".stripMargin)),
    GraftQuery("q_approx_distinct", "HLL++ approx distinct vs exact (rows-only; unit-bounded)",
      approxDistinct, None),
    GraftQuery("q_minhash_neardup", "MinHash+LSH near-dup candidate pairs w/ exact Jaccard verify",
      minhashQuery, None),
    GraftQuery("q_simhash_neardup", "SimHash 64-bit near-dup pairs (chunk-blocked)",
      simhashQuery, None),
    GraftQuery("q_explode_outer", "explode_outer keeps empty-array rows as NULL",
      explodeOuter,
      Some(
        """WITH sets AS (
          |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 40
          |    THEN list_transform(range(1, len(toks) - 38),
          |           i -> list_aggregate(toks[i : i + 39], 'string_agg', ' '))
          |    ELSE [] END) AS shingles
          |  FROM (SELECT doc_id,
          |          string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
          |        FROM documents)
          |)
          |SELECT doc_id,
          |       unnest(CASE WHEN len(shingles) = 0 THEN [NULL] ELSE shingles END) AS gram40
          |FROM sets ORDER BY doc_id, gram40 NULLS FIRST""".stripMargin)),
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
