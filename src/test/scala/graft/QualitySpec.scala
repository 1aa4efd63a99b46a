package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.engine.Quality

/** observe()-based quality gates: metrics ride the materializing job. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("observed metrics match direct computation, from the same single job") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val obs = Observation("docs-gate")
    val n = Quality.observed(docs, obs, "doc_id", requiredCols = Seq("lang")).count()
    val m = Quality.enforce(obs)
    assert(m("n_rows") == n)
    assert(m("null_key_rows") == 0L)
    assert(m("null_lang_rows") ==
      docs.where(col("lang").isNull).count())
    val approx = m("approx_distinct_keys").asInstanceOf[Long].toDouble
    val exact = docs.select(countDistinct("doc_id")).head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.10, s"approx=$approx exact=$exact")
  }

  test("enforce fails on a zero-row materialization unless allowed") {
    val none = Seq.empty[(Long, String)].toDF("k", "v")
    val obs = Observation()
    Quality.observed(none, obs, "k").count()
    val e = intercept[IllegalArgumentException](Quality.enforce(obs))
    assert(e.getMessage.contains("ZERO rows"))
    val obs2 = Observation()
    Quality.observed(none, obs2, "k").count()
    assert(Quality.enforce(obs2, allowEmpty = true)("n_rows") == 0L)
  }

  test("enforce fails on NULL keys") {
    val bad = Seq((Some(1L), "a"), (None, "b")).toDF("k", "v")
    val obs = Observation()
    Quality.observed(bad, obs, "k").count()
    val e = intercept[IllegalArgumentException](Quality.enforce(obs))
    assert(e.getMessage.contains("NULL key"))
  }
}
