package graft

/** Driver-contract invariants for SparkEntry. */
class SparkEntrySpec extends SparkTestBase {

  test("every oracle key has a registered query; keys are unique and non-empty") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    assert(os.keySet.subsetOf(qs.keySet),
      s"oracles without queries: ${os.keySet -- qs.keySet}")
    assert(Catalog.all.map(_.name).distinct.size == Catalog.all.size)
    assert(qs.keys.forall(_.startsWith("q_")))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("every tokenizing oracle embeds the canonical normalize fragment (no drift)") {
    // 16 oracles replicate TextOps.normalizeText in DuckDB SQL; a copy
    // that drifts from the canonical fragment would silently test
    // different semantics than the Spark side
    val canon =
      "regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')"
    val drifted = Catalog.all.filter(q => q.oracle.exists(o =>
      o.contains("lower(text)") && !o.contains(canon)))
    assert(drifted.isEmpty,
      s"oracles with a drifted normalization copy: ${drifted.map(_.name)}")
  }

  test("oracle SQL is single-statement and DuckDB-dialect safe (no spark-only idioms)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains(";"), s"$k: multi-statement oracle")
      assert(!sql.toLowerCase.contains("xxhash64"), s"$k: spark-only hash in oracle")
      assert(sql.toUpperCase.contains("ORDER BY") || sql.toUpperCase.startsWith("SELECT COUNT"),
        s"$k: oracle lacks deterministic ORDER BY")
    }
  }
}
