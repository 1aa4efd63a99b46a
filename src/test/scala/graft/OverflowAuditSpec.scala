package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Log, Log1p, Log2, Log10, Logarithm, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.GraftSession

/** Mechanized overflow-widening audit.
  *
  * Three rounds of review found one-off instances of the same silent
  * cross-engine divergence class (markov → psi/dsir → shard_manifest):
  * a BIGINT product aggregated or fed into log2 wraps silently in
  * Spark while DuckDB widens to HUGEINT, so both engines "succeed" and
  * the gate flakes only at the corpus size that crosses 2⁶³. The
  * repo's rule is to widen through DECIMAL(38,0) at the 100 TB design
  * point; this spec walks every registered query's ANALYZED plan and
  * flags the two reviewed shapes:
  *
  *   D1 — `Sum` whose LongType input subtree contains a long×long
  *        `Multiply` (the Σ(x·y) / Σ(x²) shape) with no decimal bridge;
  *   D2 — a log-family expression whose subtree contains a long×long
  *        `Multiply` (the log2-of-product shape).
  *
  * Every hit must either be widened or appear in the allowlist below
  * with a written domain bound proving the product cannot reach 2⁶³ at
  * any corpus size. New unwidened sums fail this suite.
  */
class OverflowAuditSpec extends SparkTestBase {

  /** name → justification for keys whose flagged products carry a
    * static domain bound (documented here, enforced nowhere else —
    * adding a key here requires writing the bound).
    */
  private val allowlist: Map[String, String] = Map(
    "q_chunk_dedup" ->
      ("Σ(copies·c_len) over chunk digests = physically stored corpus " +
        "bytes: ≤ 10¹⁴ at 100 TB (4.7 orders under 2⁶³) and still " +
        "inside BIGINT at exabyte scale"),
    "q_payload_dedup" ->
      ("Σ(copies·n_bytes) over payload digests = physically stored " +
        "corpus bytes — same bound as q_chunk_dedup"),
    "q_classifier_eval" ->
      ("y, p ∈ {0,1}: every product is a 0/1 indicator, so each sum " +
        "is ≤ the row count — a confusion-matrix cell can never " +
        "outgrow the corpus"),
    "q_dsir_sample" ->
      ("bits ∈ [−127, 127] (floor-log2 difference of DECIMAL(38,0)-" +
        "widened ratios) and c ≤ the doc's bigram count: the per-doc " +
        "Σ(c·bits) is ≤ 127 × doc length, a row-local bound"),
    "q_gopher_repetition" ->
      ("every Σ(c·len) / Σ((c−1)·len) is grouped PER DOCUMENT and " +
        "bounded by that doc's character count (a line/gram occurrence " +
        "contributes at most its own chars) — doc-local, like " +
        "q_dsir_sample"),
    "q_zipf" ->
      ("x = floor(log2(term freq)) ≤ 63, y = floor(log2(type count)) " +
        "≤ 63, and there are ≤ 64 log2 buckets: every moment sum is " +
        "≤ 64·63² ≈ 2.5×10⁵, an absolute constant"))

  private def longMulsUnder(e: Expression): Seq[Multiply] = e.collect {
    case m: Multiply
        if m.left.dataType == LongType && m.right.dataType == LongType => m
  }

  /** All D1/D2 hits in one query's analyzed plan, as compact strings. */
  private def audit(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    val hits = scala.collection.mutable.LinkedHashSet[String]()
    def walk(root: Expression): Unit = root.foreach {
      case s: Sum if s.child.dataType == LongType =>
        longMulsUnder(s.child).foreach(m =>
          hits += s"sum-of-long-product: ${m.sql}")
      case l @ (_: Log | _: Log2 | _: Log10 | _: Log1p | _: Logarithm) =>
        longMulsUnder(l).foreach(m =>
          hits += s"log-of-long-product: ${m.sql}")
      case _ => ()
    }
    def walkPlan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
      p.foreach { node =>
        node.expressions.foreach { e =>
          walk(e)
          // subquery expressions carry their own plans
          e.foreach {
            case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
              walkPlan(sq.plan)
            case _ => ()
          }
        }
      }
    }
    walkPlan(plan)
    hits.toSeq
  }

  test("a deliberately-unwidened long-product sum IS flagged (detector works)") {
    GraftSession.tuned(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs.agg(sum(col("n_chars") * col("n_chars")).as("sq"))
    assert(audit(bad).exists(_.startsWith("sum-of-long-product")),
      "the Σ(x²) fixture must trip D1")
    val badLog = docs.select(log2(col("n_chars") * col("n_chars")).as("l"))
    assert(audit(badLog).exists(_.startsWith("log-of-long-product")),
      "the log2(x·y) fixture must trip D2")
    // and the DECIMAL(38,0) bridge silences it — the prescribed fix
    val widened = docs.agg(
      sum(col("n_chars").cast("decimal(38,0)") *
        col("n_chars").cast("decimal(38,0)")).as("sq"))
    assert(audit(widened).isEmpty, "the decimal bridge must NOT trip D1")
  }

  test("registered surface: every long-product sum/log is widened or allowlisted") {
    GraftSession.tuned(spark)
    val findings = Catalog.byName.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val hits =
          try audit(q.build(spark, sfDir))
          catch { case e: Throwable => Seq(s"BUILD FAILED: ${e.getMessage}") }
        if (hits.isEmpty || allowlist.contains(name)) Nil
        else hits.map(h => s"$name  $h")
    }
    assert(findings.isEmpty,
      "unwidened long-product aggregates (widen via DECIMAL(38,0) or " +
        "allowlist with a domain bound):\n" + findings.mkString("\n"))
  }
}
