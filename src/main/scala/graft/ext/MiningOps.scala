package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.engine.{GraftSession, Tables}

/** Frequent-itemset mining over order baskets (Agrawal & Srikant 1994's
  * support/confidence/lift vocabulary, pair-level) — the co-occurrence
  * analytics family the reference's relational surface stops short of
  * (k8s/codes/variables.py:18-89 aggregates sales; it never mines
  * cross-product affinities).
  *
  * 100 TB shape: the pair generator is a per-basket self-join — fan-out
  * is Σ sᵢ² over basket sizes sᵢ, which real order data bounds by a
  * small constant (TPC-H ≤ 7 items/order); there is never a
  * corpus-level N². Baskets are deduped to (order, item) first, both
  * aggregates map-side combine, the top-k cut is TakeOrderedAndProject
  * (per-partition heads, driver merge of k·P rows), and the
  * singles/total joins attach to the 20 surviving rows, with the 1-row
  * basket count a broadcast literal. Lift keeps integer numerator and
  * denominator separate until ONE double division both engines share.
  */
object MiningOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(GraftSession.tuned(s), dir, n)

  /** Top-k item pairs by basket support with confidence and lift. */
  def itemsetPairs(lineitem: DataFrame, k: Int = 20): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nOrders = items.select(countDistinct(col("ok")).as("n"))
    val singles = items.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val pairs = items.select(col("ok"), col("pk").as("pa"))
      .join(items.select(col("ok"), col("pk").as("pb")), Seq("ok"))
      .where(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
    val top = pairs
      .orderBy(col("support").desc, col("pa"), col("pb"))
      .limit(k)
    top
      .join(singles.select(col("pk").as("pa"), col("cnt").as("cnt_a")), "pa")
      .join(singles.select(col("pk").as("pb"), col("cnt").as("cnt_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(
        col("pa"), col("pb"), col("support"), col("cnt_a"), col("cnt_b"),
        (col("support").cast("double") / col("cnt_a").cast("double"))
          .as("conf_a_b"),
        ((col("support") * col("n")).cast("double") /
          (col("cnt_a") * col("cnt_b")).cast("double")).as("lift"))
      .orderBy(col("support").desc, col("pa"), col("pb"))
  }

  /** Edit-distance-1 entity pairs via SymSpell deletion-neighborhood
    * blocking (Garbe's symmetric-delete trick): each name emits itself
    * plus its |name| single-deletion variants; two names at
    * Levenshtein 1 PROVABLY share a variant (substitution → delete the
    * differing position from both; insert/delete → the shorter IS a
    * variant of the longer), so the block join has recall 1.0 and the
    * O(n²) scan never happens. Sharing a variant does NOT imply
    * distance 1 ("ab"/"ba" share "a" at distance 2), so survivors
    * verify with the real levenshtein — exact output on any corpus.
    *
    * 100 TB shape: the ENTIRE blocking pipeline runs over DISTINCT
    * names — an exact-dup name flood (the same entity string repeated
    * millions of times, which ScaleGen's replicated customers simulate)
    * collapses to one blocking row instead of multiplying every variant
    * bucket, so candidate volume scales with the VOCABULARY, not the
    * row count (measured: the id-level formulation went 15.3× on 10×
    * data at sf1 because every replica repeats the base names; this
    * shape restores name-level scaling). Then: one row-local explode
    * (×(len+1)), an 8-byte-ish string-key equi-join whose bucket sizes
    * are deletion-neighborhood sizes (small for real entity names), a
    * narrow distinct, the codegen'd levenshtein on surviving NAME
    * pairs, and two output-bounded joins expand name pairs back to id
    * pairs (identical-name id pairs are distance 0 — never output — so
    * the expansion loses nothing). The registered query runs on
    * customer names, where single-digit substitutions are the planted
    * typo structure.
    */
  def typoPairs(entities: DataFrame, idCol: String, nameCol: String,
      sharedNamePairs: Option[DataFrame] = None): DataFrame = {
    val names = entities.select(col(idCol).as("id"), col(nameCol).as("name"))
    val namePairs = sharedNamePairs.getOrElse(
      typoNamePairs(names.select("name").distinct()))
    // the id relation scales with the corpus — pin SMJ so AQE's
    // post-blocking estimate can never try to BUILD it as a broadcast
    // (the q_substring_dup_spans sf5 lesson, re-hit at the sf10 gate)
    namePairs
      .join(names.select(col("id").as("ia"), col("name").as("na"))
        .hint("merge"), "na")
      .join(names.select(col("id").as("ib"), col("name").as("nb"))
        .hint("merge"), "nb")
      .select(
        least(col("ia"), col("ib")).as("ida"),
        greatest(col("ia"), col("ib")).as("idb"),
        when(col("ia") < col("ib"), col("na")).otherwise(col("nb")).as("name_a"),
        when(col("ia") < col("ib"), col("nb")).otherwise(col("na")).as("name_b"))
      .orderBy("ida", "idb")
  }

  /** The name-pair core of [[typoPairs]], over a DISTINCT-name
    * relation: SymSpell deletion-neighborhood blocking + levenshtein
    * verify, emitting (na, nb) with na < nb. Variants join on their
    * 8-byte xxhash64, not the variant STRING — the hashedShingleSets
    * discipline (narrower shuffle; a hash collision only adds a false
    * candidate, which the levenshtein verify kills).
    */
  def typoNamePairs(dnames: DataFrame): DataFrame = {
    graft.functions.HashExprs.register(dnames.sparkSession)
    // materialized once: the (name, vh) relation feeds BOTH pair sides
    // of the bucket join — without the cut each side re-runs the
    // distinct + per-name deletion explode
    val variants = dnames.select(col("name"), explode(expr(
      """array_distinct(transform(
        |  concat(array(name),
        |    transform(sequence(1, length(name)),
        |      i -> concat(substring(name, 1, i - 1),
        |                  substring(name, i + 1, length(name) - i)))),
        |  v -> xxhash64(v)))""".stripMargin))
      .as("vh"))
      .localCheckpoint()
    // verify BEFORE the pair-dedup distinct (the hammingBlockedPairs
    // discipline), with the SPECIALIZED graft_edit1 expression — one
    // O(n) pass, no DP matrix (measured ~30× cheaper per call than the
    // general levenshtein: the verify dropped from ~30 s to ~1 s at
    // sf2's 19.5M candidates) — so the distinct's shuffle carries only
    // the true pairs
    // both sides are the corpus-scale variant relation: pin SMJ (a
    // broadcast build of ~L×names rows OOMs the driver at decade SFs)
    variants.select(col("name").as("na"), col("vh"))
      .join(variants.select(col("name").as("nb"), col("vh"))
        .hint("merge"), Seq("vh"))
      .where(col("na") < col("nb"))
      .where(expr("graft_edit1(na, nb)"))
      .select("na", "nb").distinct()
  }

  /** BOUNDED-output twin of [[typoPairs]]: the same blocking + verify
    * pipeline, but the id-level pair expansion is replaced by exact
    * COUNTING — per name-length bucket, the number of distinct
    * edit-distance-1 name pairs and the number of id pairs they expand
    * to (cnt_a · cnt_b, summed). On fixtures whose replicated names
    * pair quadratically in replica count (the ScaleGen decade gates),
    * the exact key's cost is dominated by EMITTING the answer; this
    * key measures the same computation with output bounded by the
    * name-length domain, so decade totals reflect compute, not I/O.
    */
  def typoPairStats(entities: DataFrame, nameCol: String,
      sharedNamePairs: Option[DataFrame] = None): DataFrame = {
    // materialized once: the count relation feeds the blocking AND both
    // expansion joins (3 subtrees re-scanning the corpus otherwise)
    val counts = entities.select(col(nameCol).as("name"))
      .groupBy("name").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // counts is the distinct-name relation (corpus-scale): pin SMJ on
    // both expansion joins — AQE broadcast-built it at the sf10 gate
    // and exhausted driver memory
    sharedNamePairs.getOrElse(typoNamePairs(counts.select("name")))
      .join(counts.select(col("name").as("na"), col("cnt").as("ca"))
        .hint("merge"), "na")
      .join(counts.select(col("name").as("nb"), col("cnt").as("cb"))
        .hint("merge"), "nb")
      .groupBy(length(col("na")).cast("int").as("name_len"))
      // DECIMAL(38,0) pair-count products (HUGEINT in the oracle),
      // DOUBLE output: Σ(ca·cb) is a pair CARDINALITY — heavy name
      // duplication puts it past 2⁶³ at corpus scale, so neither the
      // accumulation nor the output column lives in BIGINT.
      .agg(count(lit(1)).as("n_name_pairs"),
        sum(col("ca").cast("decimal(38,0)") * col("cb"))
          .cast("double").as("n_id_pairs"))
      .orderBy("name_len")
  }

  // Session-memoized edit-1 NAME-pair relation over the customer
  // fixture, shared by the registered typo twins (`q_typo_pairs` +
  // `q_typo_pair_stats`): the SymSpell blocking + graft_edit1 verify +
  // pair distinct — the dominant cost of both keys — is byte-identical
  // between them (both run over DISTINCT c_name); only the downstream
  // expansion differs (id pairs vs counting). Same (session, dir)
  // memo + lifecycle policy as GraphOps' shared edges; released by
  // [[clearNamePairsMemo]] via Dedup.clearSessionMemos. typoNamePairs
  // already localCheckpoints internally, so the memoized relation is
  // materialization-cut — the memo's only job is cross-key reuse.
  private val namePairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def typoNamePairsShared(s: SparkSession, dir: String): DataFrame =
    namePairsMemo.computeIfAbsent((s, dir), _ =>
      typoNamePairs(t(s, dir, "customer")
        .select(col("c_name").as("name")).distinct())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private[ext] def clearNamePairsMemo(): Unit = {
    val it = namePairsMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); it.remove()
      try e.getValue.unpersist()
      catch { case _: Exception => () } // a stopped session's blocks are already gone
    }
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_typo_pair_stats",
      "bounded-output typo-pair census: per name-length, distinct edit-1 name pairs + the id-pair count they expand to",
      (s, dir) => typoPairStats(t(s, dir, "customer"), "c_name",
        sharedNamePairs = Some(typoNamePairsShared(s, dir))),
      // Oracle = the same deletion-neighborhood CANDIDATE set the SQL
      // below derives for q_typo_pairs (exact recall by the SymSpell
      // lemma — a theorem, not a heuristic, so no coverage is lost vs
      // the r1–r8 brute-force name cross join; verified equal at
      // sf0.001/0.01), then DuckDB's own levenshtein verify. Makes the
      // oracle scale like the engine (name-length-linear variant join
      // vs O(names²) cross) so sf0.1 certification fits the budget.
      Some(
        """WITH dn AS (SELECT c_name AS name, count(*) AS cnt
          |            FROM customer GROUP BY 1),
          |v AS (SELECT name, unnest(list_distinct(list_append(
          |        list_transform(range(1, length(name) + 1),
          |          i -> substring(name, 1, i - 1) || substring(name, i + 1)),
          |        name))) AS vv FROM dn),
          |np AS (
          |  SELECT DISTINCT a.name AS na, b.name AS nb
          |  FROM v a JOIN v b ON a.vv = b.vv AND a.name < b.name
          |  WHERE levenshtein(a.name, b.name) = 1),
          |wp AS (
          |  SELECT np.na, ca.cnt AS ca, cb.cnt AS cb
          |  FROM np JOIN dn ca ON ca.name = np.na
          |          JOIN dn cb ON cb.name = np.nb)
          |SELECT CAST(length(na) AS INT) AS name_len,
          |       count(*) AS n_name_pairs,
          |       CAST(sum(CAST(ca AS HUGEINT) * cb) AS DOUBLE) AS n_id_pairs
          |FROM wp GROUP BY 1 ORDER BY 1""".stripMargin)),
    GraftQuery("q_typo_pairs",
      "edit-distance-1 entity pairs via SymSpell deletion-neighborhood blocking (exact recall, levenshtein verify)",
      (s, dir) => typoPairs(t(s, dir, "customer"), "c_custkey", "c_name",
        sharedNamePairs = Some(typoNamePairsShared(s, dir))),
      // Deletion-neighborhood mirror of the r1–r8 brute-force id cross
      // join (EXCEPT-ALL-equal at both gate SFs): candidates = name
      // pairs sharing a single-deletion variant (or the name itself) —
      // recall 1.0 for levenshtein = 1 by the SymSpell lemma — then
      // DuckDB's levenshtein verifies and the id expansion replays the
      // Spark side's least/greatest ordering. Identical-name id pairs
      // are distance 0 and never enter np, exactly as in the engine.
      Some(
        """WITH dn AS (SELECT DISTINCT c_name AS name FROM customer),
          |v AS (SELECT name, unnest(list_distinct(list_append(
          |        list_transform(range(1, length(name) + 1),
          |          i -> substring(name, 1, i - 1) || substring(name, i + 1)),
          |        name))) AS vv FROM dn),
          |np AS (
          |  SELECT DISTINCT a.name AS na, b.name AS nb
          |  FROM v a JOIN v b ON a.vv = b.vv AND a.name < b.name
          |  WHERE levenshtein(a.name, b.name) = 1)
          |SELECT least(a.c_custkey, b.c_custkey) AS ida,
          |       greatest(a.c_custkey, b.c_custkey) AS idb,
          |       CASE WHEN a.c_custkey < b.c_custkey THEN np.na ELSE np.nb END AS name_a,
          |       CASE WHEN a.c_custkey < b.c_custkey THEN np.nb ELSE np.na END AS name_b
          |FROM np JOIN customer a ON a.c_name = np.na
          |        JOIN customer b ON b.c_name = np.nb
          |ORDER BY ida, idb""".stripMargin)),
    GraftQuery("q_itemset_pairs",
      "market-basket pair mining: top-20 co-purchased part pairs with support, confidence, lift",
      (s, dir) => itemsetPairs(t(s, dir, "lineitem"), k = 20),
      Some(
        """WITH items AS (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |n_orders AS (SELECT count(DISTINCT ok) AS n FROM items),
          |singles AS (SELECT pk, count(*) AS cnt FROM items GROUP BY pk),
          |pairs AS (
          |  SELECT i1.pk AS pa, i2.pk AS pb, count(*) AS support
          |  FROM items i1 JOIN items i2 ON i1.ok = i2.ok AND i1.pk < i2.pk
          |  GROUP BY i1.pk, i2.pk),
          |top AS (
          |  SELECT pa, pb, support FROM pairs
          |  ORDER BY support DESC, pa, pb LIMIT 20)
          |SELECT t.pa, t.pb, t.support, sa.cnt AS cnt_a, sb.cnt AS cnt_b,
          |       CAST(t.support AS DOUBLE) / CAST(sa.cnt AS DOUBLE) AS conf_a_b,
          |       CAST(t.support * n.n AS DOUBLE) /
          |       CAST(sa.cnt * sb.cnt AS DOUBLE) AS lift
          |FROM top t
          |JOIN singles sa ON sa.pk = t.pa
          |JOIN singles sb ON sb.pk = t.pb
          |CROSS JOIN n_orders n
          |ORDER BY t.support DESC, t.pa, t.pb""".stripMargin)),
    GraftQuery("q_fuzzy_best_match",
      "fuzzy-lookup entity resolution: per dirty-side name, the Jaro-Winkler argmax over the clean side (codegen'd graft_jaro_winkler, broadcast dirty side, map-side argmax)",
      // the dirty side is CAPPED to a fixed 100-entity lookup list (the
      // operator's contract — a bounded reference list), so the
      // registered key's cost is |clean| x 100 and scales LINEARLY with
      // the corpus; an uncapped supplier side grows with sf and would
      // make the key quadratic at the decade gates
      (s, dir) => fuzzyBestMatch(
        t(s, dir, "supplier").where(org.apache.spark.sql.functions.col("s_suppkey") <= 100),
        "s_suppkey", "s_name",
        t(s, dir, "customer"), "c_custkey", "c_name"),
      Some(
        """WITH sc AS (
          |  SELECT s.s_suppkey, c.c_custkey,
          |         jaro_winkler_similarity(s.s_name, c.c_name) AS jw
          |  FROM (SELECT * FROM supplier WHERE s_suppkey <= 100) s CROSS JOIN customer c),
          |best AS (SELECT s_suppkey, max(jw) AS best_jw FROM sc GROUP BY 1),
          |pick AS (
          |  SELECT sc.s_suppkey, min(sc.c_custkey) AS c_custkey
          |  FROM sc JOIN best ON sc.s_suppkey = best.s_suppkey
          |                   AND sc.jw = best.best_jw
          |  GROUP BY 1)
          |SELECT p.s_suppkey AS did, s.s_name AS dname,
          |       p.c_custkey AS cid, c.c_name AS cname, b.best_jw
          |FROM pick p
          |JOIN (SELECT * FROM supplier WHERE s_suppkey <= 100) s ON s.s_suppkey = p.s_suppkey
          |JOIN best b ON b.s_suppkey = p.s_suppkey
          |JOIN customer c ON c.c_custkey = p.c_custkey
          |ORDER BY did""".stripMargin)),
  )

  /** Fuzzy-lookup entity resolution: for every row of a SMALL dirty
    * relation, the argmax-similarity row of a large clean relation
    * under the codegen'd Jaro-Winkler expression (ties broken toward
    * the lowest clean id, so the answer is a function of the data, not
    * the schedule).
    *
    * 100 TB shape: the DIRTY side broadcasts (the operator's contract —
    * a lookup/reference list of entities to resolve, orders of
    * magnitude smaller than the corpus; big-dirty callers should block
    * first, e.g. with [[typoPairs]]-style deletion neighborhoods or
    * [[Blocking]]). The clean-side scan then never shuffles: each task
    * scores its partition against the broadcast list and partial
    * `max_by` aggregation reduces every partition to ≤ |dirty| rows
    * before the one tiny final exchange. Scoring is one whole-stage-
    * codegen loop per pair ([[graft.functions.HashImpls.jaroWinkler]]);
    * nothing is materialized per pair.
    */
  def fuzzyBestMatch(dirty: DataFrame, dirtyIdCol: String, dirtyNameCol: String,
      clean: DataFrame, cleanIdCol: String, cleanNameCol: String): DataFrame = {
    graft.functions.HashExprs.register(dirty.sparkSession)
    val d = dirty.select(col(dirtyIdCol).as("did"), col(dirtyNameCol).as("dname"))
    val c = clean.select(col(cleanIdCol).as("cid"), col(cleanNameCol).as("cname"))
    c.crossJoin(broadcast(d))
      .withColumn("jw", expr("graft_jaro_winkler(dname, cname)"))
      .groupBy("did", "dname")
      .agg(max_by(
        struct(col("cid"), col("cname"), col("jw")),
        // ordering key: best score first, then LOWEST clean id — the
        // negation makes max_by's maximum the deterministic pick
        struct(col("jw"), (-col("cid")).as("nid"))).as("best"))
      .select(col("did"), col("dname"),
        col("best.cid").as("cid"), col("best.cname").as("cname"),
        col("best.jw").as("best_jw"))
      .orderBy("did")
  }
}
