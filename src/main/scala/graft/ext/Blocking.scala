package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE oversized-group cap, shared by every blocked candidate-generation
  * path in the engine. Near-dup pipelines bound their pair volume by
  * joining inside buckets (LSH band buckets, SimHash pigeonhole chunks,
  * SemDeDup clusters, containment shingle groups); a degenerate bucket —
  * boilerplate text, empty docs, a hot shingle — would funnel O(bucket²)
  * candidates through one join key. The cap drops rows of groups whose
  * population exceeds `maxGroup` from candidate generation via a
  * broadcast anti-join: a DOCUMENTED RECALL TRADE (pairs found ONLY
  * through a dropped group are missed), never a correctness risk for
  * survivors because every caller re-verifies candidates exactly.
  *
  * Two-part API so a caller can compute the census once and prune
  * several relations consistently (both sides of a self-join must agree
  * on which buckets were dropped, or the join silently degrades into a
  * semi-capped hybrid with undefined recall).
  *
  * 100 TB shape: the census is one map-side-combined aggregate whose
  * result is at most one row per DISTINCT group over the cap — tiny by
  * construction (≤ rows/maxGroup groups can exceed the cap), hence
  * always broadcastable.
  */
object Blocking {

  /** Group keys whose population in `rows` exceeds `maxGroup` (keys
    * only — the count column is dropped so the result broadcast-anti-
    * joins directly).
    */
  def oversizedGroups(rows: DataFrame, keys: Seq[String],
      maxGroup: Int): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__group_n"))
      .where(col("__group_n") > maxGroup)
      .drop("__group_n")

  /** Drop rows belonging to `oversized` groups (broadcast left-anti on
    * the group keys). `oversized` must come from [[oversizedGroups]] on
    * a relation with the same group population — pass the SAME census to
    * every side of a join.
    */
  def pruneGroups(rows: DataFrame, oversized: DataFrame,
      keys: Seq[String]): DataFrame =
    rows.join(broadcast(oversized), keys, "left_anti")

  /** One-shot cap for single-relation callers: drop rows in groups
    * exceeding `maxGroup`. `Int.MaxValue` short-circuits to the input
    * (no census scan) — the "cap off" spelling.
    */
  def dropOversized(rows: DataFrame, keys: Seq[String],
      maxGroup: Int): DataFrame =
    if (maxGroup == Int.MaxValue) rows
    else pruneGroups(rows, oversizedGroups(rows, keys, maxGroup), keys)
}
