package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.engine.{GraftSession, Tables}

/** Similarity search over an embedding column (`array<float>`),
  * north-star Tier B.
  *
  * Baseline: brute-force cosine top-k — one broadcast of the query
  * vector, one scan, TakeOrderedAndProject for the top-k (no global
  * sort). Scale path: sign-random-projection LSH bucketing, so candidate
  * generation shuffles on bucket ids instead of comparing N×N; at 100 TB
  * the bucketed variant prunes the scan to colliding buckets.
  *
  * All vector math is codegen'd builtin higher-order functions
  * (zip_with/aggregate) — no UDF, no driver collect.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(GraftSession.tuned(s), dir, n)

  /** Cosine similarity of two array<float|double> columns, computed in
    * double with a strict left-to-right fold (deterministic).
    */
  def cosine(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |          CAST(0 AS DOUBLE), (acc, v) -> acc + v) /
       |(sqrt(aggregate($a, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) *
       | sqrt(aggregate($b, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin)

  /** Brute-force cosine top-k vs one query vector (broadcast, no shuffle
    * of the big side; top-k via TakeOrderedAndProject).
    */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val qv = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    emb.crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"), cosine("embedding", "qv").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Sign-random-projection bucket id over `numPlanes` deterministic
    * pseudo-random hyperplanes (components derived from xxhash64(plane,
    * dim) — reproducible across runs and engines, no RNG state).
    */
  def srpBucket(embCol: String, numPlanes: Int): Column = expr(
    s"""aggregate(sequence(0, ${numPlanes - 1}), 0, (acc, p) ->
       |  acc + CASE WHEN aggregate(zip_with($embCol, sequence(0, size($embCol) - 1),
       |                    (x, i) -> CAST(x AS DOUBLE) * ((CAST(xxhash64(p, i) % 1001 AS DOUBLE)) / 1000.0)),
       |                  CAST(0 AS DOUBLE), (a, v) -> a + v) > 0
       |             THEN shiftleft(1, p) ELSE 0 END)""".stripMargin)

  /** LSH-bucketed ANN top-k: restrict the exact cosine scan to vectors
    * colliding with the query's SRP bucket, then rank. The scale path for
    * [[bruteForceTopK]].
    */
  def lshTopK(emb: DataFrame, queryVecId: Long, k: Int, numPlanes: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket", srpBucket("embedding", numPlanes))
    val q = bucketed.where(col("vec_id") === queryVecId)
      .select(col("bucket"), col("embedding").as("qv"))
    bucketed.join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"), col("label"), col("bucket"),
        cosine("embedding", "qv").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs: LSH-blocked (same SRP bucket), then
    * exact cosine ≥ threshold inside buckets — never N×N.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double, numPlanes: Int = 4): DataFrame = {
    val bucketed = emb
      .withColumn("bucket", srpBucket("embedding", numPlanes))
      .select(col("bucket"), col("vec_id"), col("embedding"))
    val l = bucketed.select(col("bucket"), col("vec_id").as("id1"), col("embedding").as("e1"))
    val r = bucketed.select(col("bucket"), col("vec_id").as("id2"), col("embedding").as("e2"))
    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine("e1", "e2").as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .distinct()
      .orderBy("id1", "id2")
  }

  // ---- registered queries ----------------------------------------------

  def cosineTopkQuery(s: SparkSession, dir: String): DataFrame =
    bruteForceTopK(t(s, dir, "embeddings"), queryVecId = 0L, k = 20)

  def lshTopkQuery(s: SparkSession, dir: String): DataFrame =
    lshTopK(t(s, dir, "embeddings"), queryVecId = 0L, k = 10)

  def nearDupQuery(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(t(s, dir, "embeddings"), threshold = 0.8)

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_cosine_topk", "brute-force cosine top-k vs query vector",
      cosineTopkQuery,
      Some(
        """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          |sims AS (
          |  SELECT vec_id, label,
          |    list_sum(list_transform(range(1, len(embedding) + 1),
          |             i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
          |    (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
          |     sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_sim
          |  FROM embeddings, q)
          |SELECT vec_id, label, cos_sim FROM sims ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin)),
    GraftQuery("q_ann_lsh_topk", "SRP-LSH bucketed ANN top-k (scale path)",
      lshTopkQuery, None),
    GraftQuery("q_embed_neardup", "embedding-cosine near-dup pairs, LSH-blocked",
      nearDupQuery, None),
  )
}
