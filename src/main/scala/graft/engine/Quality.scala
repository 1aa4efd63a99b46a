package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability: data-quality counters attached to a
  * DataFrame with `Dataset.observe`, so the metrics ride the SAME job
  * that materializes the data — no second scan of the input. At 100 TB
  * a separate profiling query doubles the read cost; observed metrics
  * are free (they aggregate inside the running tasks and surface on the
  * driver when the action completes).
  *
  * Usage:
  * {{{
  * val obs = Observation("curated-gate")
  * Quality.observed(df, obs, keyCol = "id", requiredCols = Seq("name"))
  *   .write.parquet(out)                       // one job, metrics included
  * val m = obs.get                             // row count, null counts...
  * require(m("null_key_rows") == 0L)
  * }}}
  */
object Quality {

  /** Attach row count, null-key count, approximate distinct-key count
    * (observe forbids DISTINCT aggregates — HLL is the observable
    * stand-in; exact uniqueness needs its own groupBy job), and per-
    * column null counts.
    */
  def observed(df: DataFrame, obs: Observation, keyCol: String,
      requiredCols: Seq[String] = Nil): DataFrame = {
    val nullCount: String => Column =
      c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_${c}_rows")
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_key_rows") +:
        approx_count_distinct(col(keyCol)).as("approx_distinct_keys") +:
        requiredCols.map(nullCount)
    df.observe(obs, metrics.head, metrics.tail: _*)
  }

  /** Fail the pipeline when the observed gate is violated. Call AFTER
    * the action that materialized the observed DataFrame (obs.get
    * blocks until one has run).
    *
    * Over ZERO rows the sum-based metrics come back NULL (and a naive
    * Long unbox turns NULL into 0 — a silent pass); an empty
    * materialization almost always means an upstream bug ate the
    * dataset, so it fails the gate by default. Pass
    * `allowEmpty = true` for pipelines where empty is legitimate.
    */
  def enforce(obs: Observation, allowEmpty: Boolean = false): Map[String, Any] = {
    val m = obs.get
    val nRows = m("n_rows").asInstanceOf[Long]
    require(allowEmpty || nRows > 0L, "quality gate: materialized ZERO rows")
    val nullKeys = Option(m("null_key_rows")).fold(0L)(_.asInstanceOf[Long])
    require(nullKeys == 0L, s"quality gate: $nullKeys rows with NULL key")
    m
  }
}
