package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleGen

/** The decade-fixture generator must preserve the invariants the sf1
  * spot gate's conclusions rest on: per-replica FK integrity (join
  * fan-in per key unchanged), exact replica multiplicity, and
  * cross-replica text disjointness (near-dup structure replicates
  * instead of collapsing into artificial cross-replica clusters).
  */
class ScaleGenSpec extends SparkTestBase {

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft-scalegen").toString
    ScaleGen.run(spark, sfDir, d, 3)
    d
  }
  private def out(n: String) = spark.read.parquet(s"$dst/$n.parquet")
  private def src(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")

  test("facts and corpus replicate exactly reps times; dims copy once") {
    for (t <- Seq("customer", "orders", "lineitem", "documents", "events", "embeddings"))
      assert(out(t).count() == 3 * src(t).count(), s"table $t")
    for (t <- Seq("nation", "region", "supplier", "part"))
      assert(out(t).count() == src(t).count(), s"dim $t")
  }

  test("FK integrity survives key shifting: no dangling o_custkey or l_orderkey") {
    val danglingCust = out("orders")
      .join(out("customer"),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    val danglingOrd = out("lineitem")
      .join(out("orders"),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(danglingCust == 0 && danglingOrd == 0)
    // and fan-in per key is unchanged: every customer key's order count
    // matches some base customer's (replication adds keys, not fan-in)
    val baseMax = src("orders").groupBy("o_custkey").count()
      .agg(max("count")).head().getLong(0)
    val repMax = out("orders").groupBy("o_custkey").count()
      .agg(max("count")).head().getLong(0)
    assert(repMax == baseMax, s"fan-in changed: $baseMax -> $repMax")
  }

  test("replica texts are pairwise distinct but length-preserving (rotation, not mutation)") {
    val docSpan = src("documents").agg(max("doc_id")).head().getLong(0) + 1
    val base = out("documents").where(col("doc_id") < docSpan)
      .select(col("doc_id").as("b_id"), col("text").as("b_text"))
    val rep1 = out("documents")
      .where(col("doc_id") >= docSpan && col("doc_id") < 2 * docSpan)
      .select((col("doc_id") - docSpan).as("b_id"),
        col("text").as("r_text"))
    val joined = base.join(rep1, "b_id")
    val sameText = joined.where(col("b_text") === col("r_text")).count()
    val lenDrift = joined
      .where(length(col("b_text")) =!= length(col("r_text"))).count()
    assert(sameText == 0, s"$sameText docs byte-identical across replicas")
    assert(lenDrift == 0, s"$lenDrift docs changed length under rotation")
  }

  test("embedding cluster COUNT grows with replicas at constant cluster size (SemDeDup shape)") {
    val baseSizes = src("embeddings").groupBy("label").count()
    val repSizes = out("embeddings").groupBy("label").count()
    assert(repSizes.count() == 3 * baseSizes.count(),
      "distinct labels must grow reps x")
    val baseMax = baseSizes.agg(max("count")).head().getLong(0)
    val repMax = repSizes.agg(max("count")).head().getLong(0)
    assert(repMax == baseMax,
      s"max cluster size changed: $baseMax -> $repMax (within-cluster pair volume must stay constant)")
  }

  test("skew mode plants the hot keys it promises, and the de-windowed family absorbs them") {
    // the standing adversarial-skew regression (r10 verdict item 1):
    // the de-windowed keep-one dedup operators must stay CORRECT under
    // one massive hot key — the workload the r10 rewrite targets. The
    // decade TIMING table lives in BASELINE.md; this spec pins the
    // fixture's planted structure + the operators' hot-key semantics,
    // so a refactor that reintroduces a content-keyed window (or
    // breaks the fixture) fails here, not in a bench eyeball.
    val d = java.nio.file.Files.createTempDirectory("graft-skewgen").toString
    ScaleGen.run(spark, sfDir, d, 2, skew = true)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val n = docs.count()
    assert(n == 2 * src("documents").count())
    assert(docs.select("doc_id").distinct().count() == n,
      "skew id rewrite must keep doc_id unique")
    // every doc carries the byte-identical hot line + block
    assert(docs.where(col("text").contains(ScaleGen.hotLine)).count() == n)
    assert(docs.where(col("text").contains(ScaleGen.hotBlock)).count() == n)
    // ~20% of docs form ONE hot refetch population
    val hot = docs.where(col("source") === "hot").count()
    assert(hot >= n / 6 && hot <= n / 4, s"hot population $hot of $n")
    assert(docs.where(col("source") === "hot")
      .where(col("doc_id") % 97 =!= 0).count() == 0,
      "hot docs must share the /r/0 resource (doc_id ≡ 0 mod 97)")

    // url dedup collapses the hot canon to exactly ONE survivor
    val kept = graft.ext.WebOps.urlDedup(docs)
    assert(kept.where(col("url").contains("HOT.Example.COM")).count() == 1,
      "one canonical URL refetched hot-many times keeps exactly one doc")
    // line dedup keeps the hot line at exactly ONE (doc, line) corpus-wide
    val rebuilt = graft.ext.Dedup.lineDedup(docs)
    assert(rebuilt.where(col("new_text").contains(ScaleGen.hotLine))
      .count() == 1,
      "the corpus-wide hot boilerplate line survives exactly once")
    // the block plants at least one CDC digest shared by EVERY doc
    val hotDigests = graft.ext.Multimodal.cdcChunks(docs)
      .groupBy("digest").agg(countDistinct("asset_id").as("nd"))
      .where(col("nd") === n).count()
    assert(hotDigests >= 1,
      s"expected >= 1 corpus-wide hot CDC digest, got $hotDigests")
    // 10% of embeddings are ONE byte-identical hot vector
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val hotVecs = emb.where(col("vec_id") % 10 === 0)
    assert(hotVecs.select("embedding").distinct().count() == 1,
      "all hot vectors must be byte-identical (one red-hot bucket)")
    assert(hotVecs.count() >= emb.count() / 11)
    // every doc shows duplicated substring mass at least the hot region
    val spans = graft.ext.Dedup.substringDupSpans(docs, "text", "doc_id")
    assert(spans.count() == n, "every doc carries duplicated substrings")
    val minDup = spans.agg(min("dup_chars")).head().getLong(0)
    assert(minDup >= ScaleGen.hotLine.length,
      s"hot region must register as duplicated chars in every doc: $minDup")
    // the bounded near-dup report stays O(n·m) on exactly the corpus
    // where the all-pairs report's TRUE output is quadratic (the
    // boilerplate makes most docs pairwise similar): output ≤ 3·n and
    // per-doc ranks are a clean 1..k prefix
    val topm = graft.ext.Dedup.nearDupTopM(spark, d)
    val topn = topm.count()
    assert(topn <= 3 * n, s"top-m output must be ≤ 3·n = ${3 * n}: $topn")
    val badRanks = topm.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("rk").as("mx"))
      .where(col("mx") =!= col("k")).count()
    assert(badRanks == 0, "per-doc ranks must be the prefix 1..k")
  }

  test("reps outside 1..312 are rejected (313 would repeat an affine permutation)") {
    // an independent path: the validation must fire before any Spark
    // work, so this test must not touch the lazily-generated `dst`
    val bad = java.nio.file.Files.createTempDirectory("graft-scalegen-bad").toString
    intercept[IllegalArgumentException] { ScaleGen.run(spark, sfDir, bad, 313) }
    intercept[IllegalArgumentException] { ScaleGen.run(spark, sfDir, bad, 0) }
  }

  test("affine text permutations are pairwise distinct across 40 replicas") {
    // replicas 26..39 exercise the a != 1 residues the Caesar rotation
    // never reached: no two replicas may share a letter permutation,
    // and each must be a bijection (translate cannot merge letters)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val coprimes26 = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    def permL(i: Int): String = {
      val (a, b) = (coprimes26(i / 26 % 12), i % 26)
      (0 until 26).map(p => alpha((a * p + b) % 26)).mkString
    }
    val perms = (0 until 40).map(permL)
    assert(perms.distinct.size == 40, "letter permutations must not repeat")
    perms.foreach(p => assert(p.toSet.size == 26, s"not a bijection: $p"))
    // i < 26 must reproduce the original Caesar rotation byte-for-byte
    (0 until 26).foreach { i =>
      assert(permL(i) == alpha.drop(i) + alpha.take(i), s"replica $i drifted")
    }
  }
}
