package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.GraphOps

/** PageRank / link-graph invariants: the integer fixed-point iteration
  * against a plain-JVM mirror on a crafted graph, edge construction
  * semantics, and plan shape.
  */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  // 2 users, 7 events over pages 1/2/3: transitions u1: 1->2->3->1,
  // u2: 1->2 — edges (1->2) w=2, (2->3) w=1, (3->1) w=1
  private def craftedEvents = Seq(
    (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (1L, 40L, 1),
    (2L, 10L, 1), (2L, 25L, 2),
    (3L, 11L, 7)) // isolated page: node with no edges at all
    .map { case (u, t, k) =>
      (u, new Timestamp(t * 1000L), u * 100 + t, s"""{"k": $k}""")
    }
    .toDF("user_id", "ts", "event_id", "props")

  test("transition edges: per-user lag over (ts, event_id), counted") {
    val edges = GraphOps.transitionEdges(craftedEvents)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(edges == Map((1, 2) -> 2L, (2, 3) -> 1L, (3, 1) -> 1L))
  }

  /** Shared JVM mirror of pageRankOnGraph's exact-integer iteration —
    * ONE definition, so the transition-graph and TextRank tests cannot
    * drift on the damping/scale arithmetic.
    */
  private def jvmPageRank[N](edges: Map[(N, N), Long], nodes: Seq[N],
      iters: Int = 3): Map[N, Long] = {
    val outw = edges.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = nodes.map { v =>
        v -> edges.collect { case ((u, d), w) if d == v =>
          r(u) * w / outw(u) // Long division == Spark/DuckDB `div` on positives
        }.sum
      }.toMap
      r = nodes.map(v => v -> (150000L + 17L * contrib(v) / 20L)).toMap
    }
    r
  }

  test("pageRank matches a plain-JVM integer mirror on the crafted graph") {
    val r = jvmPageRank(Map((1, 2) -> 2L, (2, 3) -> 1L, (3, 1) -> 1L),
      Seq(1, 2, 3, 7))
    val got = GraphOps.pageRank(craftedEvents, iters = 3)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == r, s"spark $got != jvm $r")
    // sanity on the crafted shape: the isolated page holds only the
    // teleport mass; every linked page accumulated more
    assert(got(7) == 150000L)
    assert(Seq(1, 2, 3).forall(n => got(n) > got(7)))
  }

  test("fixture pageRank: one row per page, deterministic rerun, no cartesian in the plan") {
    val df = GraphOps.pageRankQuery(spark, sfDir)
    val rows = df.collect()
    val nPages = spark.read.parquet(s"$sfDir/events.parquet")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .where(col("k").isNotNull).distinct().count()
    assert(rows.length == nPages, "one rank per page")
    assert(rows.forall(_.getLong(1) >= 150000L), "rank >= teleport mass")
    val again = GraphOps.pageRankQuery(spark, sfDir).collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getInt(0), r.getLong(1))).toSeq, "rerun-identical")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cartesian in pageRank plan:\n${plan.take(800)}")
  }

  test("doc-quote pageRank: quoted doc outranks quoters; matches the JVM mirror") {
    // docs 1 and 2 both embed doc 0's full trigram set (containment
    // 0 ⊆ 1, 0 ⊆ 2 at 1.0) → quote edges 1→0 and 2→0; doc 3 is
    // disjoint (isolated node, teleport mass only)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "prefix words alpha beta gamma delta epsilon suffix words here"),
      (3L, "totally unrelated content nothing shared at all"))
      .toDF("doc_id", "text")
    val got = GraphOps.docPageRank(docs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mirror = jvmPageRank(Map((1L, 0L) -> 1L, (2L, 0L) -> 1L),
      Seq(0L, 1L, 2L, 3L))
    assert(got == mirror, s"spark $got != jvm $mirror")
    assert(got(0L) > got(3L) && got(1L) == 150000L && got(3L) == 150000L,
      "rank mass flows from quoters to the quoted doc only")
  }

  test("textRank matches a plain-JVM mirror on a crafted corpus; hub token ranks first") {
    // pre-normalized text: tokenization reduces to whitespace split.
    // 'data' is the hub (co-occurs with everything)
    val docs = Seq(
      "data quality data pipeline",
      "data spark pipeline",
      "spark data",
      "solo").toDF("text")
    // JVM mirror of the whole pipeline
    val tokLists = Seq(
      Seq("data", "quality", "data", "pipeline"),
      Seq("data", "spark", "pipeline"),
      Seq("spark", "data"),
      Seq("solo"))
    val dirPairs = tokLists.flatMap(t => t.zip(t.drop(1))).filter(p => p._1 != p._2)
    val und = dirPairs ++ dirPairs.map(_.swap)
    val edges = und.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val nodes = tokLists.flatten.distinct
    val r = jvmPageRank(edges, nodes)
    val expect = r.toSeq.sortBy { case (tok, ru) => (-ru, tok) }.take(50)
    val got = graft.ext.GraphOps.textRankKeywords(docs, iters = 3, k = 50)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toSeq
    assert(got == expect, s"spark $got != jvm $expect")
    assert(got.head._1 == "data", "hub token must rank first")
    assert(got.exists { case (tok, ru) => tok == "solo" && ru == 150000L },
      "isolated token carries teleport mass only")
  }

  /** Brute-force per-node triangle counts over an undirected edge set —
    * the O(n³) mirror the oriented-wedge pipeline must match.
    */
  private def jvmTriangles(und: Set[(Int, Int)]): Map[Int, Long] = {
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def has(a: Int, b: Int) = und.contains((a min b, a max b))
    val counts = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if has(a, b) && has(a, c) && has(b, c)
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangle census: crafted triangle + pendant, exact counts and lcc") {
    // u1 walks 1->2->3->1 (closes the triangle), u2 walks 3->4 (pendant)
    val ev = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (1L, 40L, 1),
      (2L, 10L, 3), (2L, 20L, 4))
      .map { case (u, t, k) =>
        (u, new Timestamp(t * 1000L), u * 100 + t, s"""{"k": $k}""")
      }
      .toDF("user_id", "ts", "event_id", "props")
    val got = GraphOps.triangleStats(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1 -> ((2L, 1L, 1.0)), 2 -> ((2L, 1L, 1.0)),
      3 -> ((3L, 1L, 1.0 / 3.0)), 4 -> ((1L, 0L, 0.0))), s"got $got")
  }

  test("triangle census matches the brute-force mirror on the fixture graph") {
    val events = graft.engine.Tables.load(spark, sfDir, "events")
    val und = GraphOps.undirectedEdges(GraphOps.transitionEdges(events))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val expect = jvmTriangles(und)
    val got = GraphOps.triangleStats(events).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got.filter(_._2 > 0) == expect.filter(_._2 > 0),
      "per-node triangle counts must equal brute force")
  }

  /** Synchronous-LPA JVM mirror: max total incident weight, min-label
    * tie-break, isolated/no-inflow nodes keep their label.
    */
  private def jvmLpa(adj: Map[(Int, Int), Long], nodes: Seq[Int],
      iters: Int): Map[Int, Int] = {
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = nodes.map { v =>
        // .toSeq first: a Map.collect producing (label, w) pairs would
        // DEDUP by label and silently drop weight mass
        val inc = adj.toSeq.collect { case ((n, nbr), w) if n == v => (lab(nbr), w) }
          .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
        if (inc.isEmpty) v -> lab(v)
        else v -> -inc.toSeq.map { case (l, ws) => (ws, -l) }.max._2
      }.toMap
    }
    lab
  }

  test("label propagation matches the JVM mirror on the fixture graph; sizes consistent") {
    val events = graft.engine.Tables.load(spark, sfDir, "events")
    val e = GraphOps.transitionEdges(events)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val undW = e.toSeq.filter { case ((s0, d0), _) => s0 != d0 }
      .groupBy { case ((s0, d0), _) => (s0 min d0, s0 max d0) }
      .map { case (p, xs) => p -> xs.map(_._2).sum }
    val adj = undW.flatMap { case ((a, b), w) =>
      Seq((a, b) -> w, (b, a) -> w) }
    // node universe = every observed page (pageRank's universe), so
    // self-loop-only / transition-free pages appear as singletons
    val nodes = events
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .where(col("k").isNotNull).distinct()
      .collect().map(_.getInt(0)).toSeq
    val expect = jvmLpa(adj, nodes, iters = 3)
    val rows = GraphOps.labelPropagation(events, iters = 3).collect()
    val got = rows.map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == expect, "community labels must equal the sync-LPA mirror")
    // csize column is the count of nodes sharing the label
    val sizes = expect.values.toSeq.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    assert(rows.forall(r => r.getLong(2) == sizes(r.getInt(1))), "community sizes")
  }

  test("recursive-CTE reach paths match a JVM BFS product mirror at sf0.001") {
    val events = graft.engine.Tables.load(spark, sfDir, "events")
    val e = GraphOps.transitionEdges(events)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val seed = e.keys.map(_._1).min
    var frontier = Map(seed -> 1L)
    val expect = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (depth <- 1 to 3) {
      val next = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
      for ((n, paths) <- frontier; (((s0, d0), w)) <- e if s0 == n)
        next(d0) += paths * w
      frontier = next.toMap
      frontier.foreach { case (n, p) => expect((n, depth)) = p }
    }
    val got = GraphOps.reachPaths(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expect.toMap, s"reach paths diverge: got ${got.size} keys, expect ${expect.size}")
  }

  test("k-core: pendant chain cascades off round by round, the clique survives with full degree") {
    import spark.implicits._
    // 4-clique {1,2,3,4} plus a pendant chain 4-5-6-7: a one-shot
    // degree-2 filter keeps 5 and 6 (deg 2), but the 2-core peel
    // cascades — 7 falls (deg 1), then 6, then 5 — leaving the clique
    val clique = for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield (a, b)
    val und = (clique ++ Seq((4, 5), (5, 6), (6, 7))).toDF("a", "b")
    val out = GraphOps.kCoreOnEdges(und, k = 2, rounds = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
    // one round too few and the cascade is still mid-flight: 5 survives
    val short = GraphOps.kCoreOnEdges(und, k = 2, rounds = 2).collect()
      .map(_.getInt(0)).toSet
    assert(short.contains(5) && !short.contains(6) && !short.contains(7))
  }

  test("k-core fixpoint: a cascade deeper than the 4-round unroll peels completely") {
    import spark.implicits._
    // 4-clique {1,2,3,4} plus a pendant chain 4-5-6-...-12: the 2-core
    // deletion cascade is 8 rounds deep (12 falls, then 11, ... then 5)
    // — provably past the bounded unroll — while the clique survives
    val clique = for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield (a, b)
    val chain = (4 to 11).map(i => (i, i + 1))
    val und = (clique ++ chain).toDF("a", "b")
    // the bounded 4-round unroll under-peels: mid-cascade survivors remain
    val bounded = GraphOps.kCoreOnEdges(und, k = 2, rounds = 4).collect()
      .map(_.getInt(0)).toSet
    assert(bounded.exists(_ > 4), s"cascade not deep enough: $bounded")
    // the fixpoint peels the whole chain and keeps exactly the clique
    val fix = GraphOps.kCoreFixpointOnEdges(und, k = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fix == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L), s"got $fix")
  }

  test("fixture k-core fixpoint matches a plain-JVM iterative-peel mirror") {
    val und = GraphOps.undirectedEdges(GraphOps.transitionEdges(
      spark.read.parquet(s"$sfDir/events.parquet")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // JVM mirror: peel nodes of degree < k until stable, then report
    // each survivor's degree within the surviving set
    val k = 13
    val adj = scala.collection.mutable.Map.empty[Int, Set[Int]]
    und.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    var surv = adj.keySet.toSet
    var changed = true
    while (changed) {
      val next = surv.filter(n => (adj(n) & surv).size >= k)
      changed = next != surv
      surv = next
    }
    val expect = surv.map(n => n -> (adj(n) & surv).size.toLong).toMap
    val fix = GraphOps.kCoreFixpointQuery(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fix == expect, s"fixpoint ${fix.size} keys vs mirror ${expect.size}")
  }

  test("graph degrees: strengths are consistent with the edge list (sum out_w == sum in_w == sum w)") {
    val deg = GraphOps.graphDegrees(spark, sfDir)
    val sums = deg.agg(sum("out_w"), sum("in_w")).head()
    val totalW = GraphOps.transitionEdges(
      graft.engine.Tables.load(spark, sfDir, "events"))
      .agg(sum("w")).head().getLong(0)
    assert(sums.getLong(0) == totalW && sums.getLong(1) == totalW)
  }
}
