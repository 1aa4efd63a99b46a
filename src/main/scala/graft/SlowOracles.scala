package graft

/** Retired brute-force DuckDB oracle formulations, kept behind a slow
  * gate (r9 ADVICE).
  *
  * Background: through r8 the oracles for the 8 keys below were
  * O(n²) cross joins (exact pairwise Jaccard / containment /
  * levenshtein over every pair). They were rewritten to inverted-index
  * / SymSpell candidate-generation formulations so the sf0.1
  * certification fits the per-key budget (691–2230 s → ~58 s total) —
  * but the rewritten oracles structurally MIRROR the engine's own
  * candidate generation, which weakens oracle independence: an edit
  * that breaks engine and oracle the same way would slip the gate.
  *
  * This registry preserves the ORIGINAL brute-force SQL so the
  * equivalence "live oracle ≡ retired brute force" stays mechanically
  * re-checkable: `graft.Verify` dumps it as `oracle_sql_slow.json`
  * alongside `oracle_sql.json`, and `tools/oracle_ab.py` runs BOTH
  * formulations in DuckDB and EXCEPT-ALLs them both ways. Re-run the
  * tool whenever either formulation is edited (sf0.001/sf0.01 take
  * seconds; sf0.1 is the patient run — minutes to tens of minutes for
  * the O(n²) side, which is exactly why it is a slow GATE and not the
  * live oracle).
  *
  * For keys where only a shared CTE fragment was rewritten
  * (containment / components), the slow SQL is derived from the LIVE
  * oracle text by swapping the fragment back — the surrounding tail
  * can never drift between the two formulations, and the swap is
  * `require`-guarded so a fragment rename breaks the build instead of
  * silently comparing the live oracle against itself.
  */
object SlowOracles {

  /** Retired O(n²) exact-Jaccard pair oracle (word n-gram shingles,
    * list_intersect over full shingle lists, every a.doc_id < b.doc_id
    * pair evaluated). The live oracle is the inverted-index rewrite in
    * [[graft.ext.Dedup]] (bruteForcePairsSql).
    */
  private def bruteForcePairsO2Sql(n: Int, threshold: Double = 0.5): String =
    s"""WITH sets AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= $n
       |    THEN list_transform(range(1, len(toks) - $n + 2),
       |           i -> array_to_string(list_slice(toks, i, i + $n - 1), ' '))
       |    ELSE [] END) AS shingles
       |  FROM (SELECT doc_id,
       |          string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
       |        FROM documents)
       |)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
       |       len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
       |FROM sets a JOIN sets b ON a.doc_id < b.doc_id
       |WHERE len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
       |  AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
       |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= $threshold
       |ORDER BY id1, id2""".stripMargin

  /** Retired O(n²) directed-containment fragment (trigram shingles,
    * list_intersect over full lists). Same-named CTEs (`sets`, `ov`,
    * `directed`) as the live [[graft.ext.Dedup.containmentCteSql]], so
    * it drops into the same oracle tails.
    */
  private val bruteContainmentCteSql: String =
    """sets AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |    THEN list_transform(range(1, len(toks) - 1),
      |           i -> array_to_string(list_slice(toks, i, i + 2), ' '))
      |    ELSE [] END) AS shingles
      |  FROM (SELECT doc_id,
      |          string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |        FROM documents)),
      |ov AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb,
      |         len(list_intersect(a.shingles, b.shingles)) AS c,
      |         len(a.shingles) AS na, len(b.shingles) AS nb
      |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.shingles, b.shingles)) > 0),
      |directed AS (
      |  SELECT ida AS sub_id, idb AS sup_id,
      |         CAST(c AS DOUBLE) / CAST(na AS DOUBLE) AS containment FROM ov
      |  UNION ALL
      |  SELECT idb, ida, CAST(c AS DOUBLE) / CAST(nb AS DOUBLE) FROM ov)""".stripMargin

  /** Retired O(n²) near-dup edge list + recursive closure fragment
    * (bigram shingles). Same CTE names as the live
    * [[graft.ext.Dedup.componentsCteSql]].
    */
  private val bruteComponentsCteSql: String =
    """WITH RECURSIVE sets AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 2
      |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
      |    ELSE [] END) AS shingles
      |  FROM (SELECT doc_id,
      |          string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |        FROM documents)
      |), edges AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      |  WHERE len(list_distinct(list_concat(a.shingles, b.shingles))) > 0
      |    AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
      |), sym AS (SELECT id1 AS a, id2 AS b FROM edges UNION SELECT id2, id1 FROM edges),
      |nodes AS (SELECT DISTINCT a AS id FROM sym),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
      |),
      |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin

  /** Retired O(names²) typo-pair oracles: every distinct-name /
    * every-id pair levenshtein'd directly (the live oracles derive
    * candidates from the SymSpell single-deletion neighborhood first).
    */
  private val bruteTypoPairsSql: String =
    """SELECT a.c_custkey AS ida, b.c_custkey AS idb,
      |       a.c_name AS name_a, b.c_name AS name_b
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
      |  AND levenshtein(a.c_name, b.c_name) = 1
      |ORDER BY ida, idb""".stripMargin

  private val bruteTypoPairStatsSql: String =
    """WITH dn AS (SELECT c_name AS name, count(*) AS cnt
      |            FROM customer GROUP BY 1),
      |np AS (
      |  SELECT a.name AS na, a.cnt AS ca, b.cnt AS cb
      |  FROM dn a JOIN dn b ON a.name < b.name
      |  WHERE abs(length(a.name) - length(b.name)) <= 1
      |    AND levenshtein(a.name, b.name) = 1)
      |SELECT CAST(length(na) AS INT) AS name_len,
      |       count(*) AS n_name_pairs,
      |       CAST(sum(ca * cb) AS BIGINT) AS n_id_pairs
      |FROM np GROUP BY 1 ORDER BY 1""".stripMargin

  /** Derive a slow variant from the LIVE oracle by swapping a rewritten
    * fragment back to its brute-force original. require-guarded: if the
    * live oracle no longer embeds the fragment (rename, refactor), the
    * derivation must fail loudly — a no-op swap would EXCEPT-ALL the
    * live oracle against itself and always "pass".
    */
  private def swapped(key: String, liveFragment: String,
      bruteFragment: String): (String, String) = {
    val live = Catalog.byName(key).oracle.getOrElse(
      sys.error(s"SlowOracles: $key has no live oracle"))
    require(live.contains(liveFragment),
      s"SlowOracles: $key's live oracle no longer embeds the expected " +
        "rewritten fragment — update SlowOracles to match")
    key -> live.replace(liveFragment, bruteFragment)
  }

  /** key → retired brute-force oracle SQL, for every key whose live
    * oracle was rewritten away from brute force (r8 commit a886cca).
    */
  lazy val byName: Map[String, String] = Map(
    "q_minhash_neardup" -> bruteForcePairsO2Sql(2),
    "q_setsim_join" -> bruteForcePairsO2Sql(3),
    "q_typo_pairs" -> bruteTypoPairsSql,
    "q_typo_pair_stats" -> bruteTypoPairStatsSql,
    swapped("q_containment_join",
      graft.ext.Dedup.containmentCteSql, bruteContainmentCteSql),
    swapped("q_pagerank_docs",
      graft.ext.Dedup.containmentCteSql, bruteContainmentCteSql),
    swapped("q_dedup_clusters",
      graft.ext.Dedup.componentsCteSql, bruteComponentsCteSql),
    swapped("q_dedup_apply",
      graft.ext.Dedup.componentsCteSql, bruteComponentsCteSql))
}
