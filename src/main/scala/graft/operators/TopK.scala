package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.engine.{GraftSession, Tables}

/** Typed top-k via a custom `Aggregator[IN, BUF, OUT]` — the scale
  * alternative to the `row_number()` window (SURVEY §2.11).
  *
  * Why it matters at 100 TB: the window formulation shuffles EVERY row to
  * its group and sort-buffers whole groups; this aggregator keeps a
  * bounded k-element buffer per group on the map side (partial
  * aggregation), so the shuffle carries at most k rows per group per
  * partition. Same result set as the window query — the driver gate
  * checks it against the identical oracle.
  */
object TopK {

  final case class CustRow(c_mktsegment: String, c_custkey: Long,
      c_name: String, acctbal_raw: Double, acctbal: Double)

  /** Keep the k largest by (raw acctbal desc, c_custkey asc) — the RAW
    * value ranks (matching the window/oracle ORDER BY); the rounded one
    * is the projected output. The buffer INVARIANT is "sorted, ≤ k
    * rows": `reduce` rejects a non-qualifying row in O(1) (the common
    * case once the buffer is full — this is what makes the map side
    * cheap) and otherwise inserts at its sorted position in O(k); only
    * `merge`/`finish` (per partial buffer, not per row) re-sort.
    */
  final class TopKCustomers(k: Int) extends Aggregator[CustRow, Seq[CustRow], Seq[CustRow]] {
    private val ord: Ordering[CustRow] =
      Ordering.by((r: CustRow) => (-r.acctbal_raw, r.c_custkey))
    private def best(xs: Seq[CustRow]): Seq[CustRow] = xs.sorted(ord).take(k)
    override def zero: Seq[CustRow] = Seq.empty
    override def reduce(b: Seq[CustRow], a: CustRow): Seq[CustRow] =
      if (b.size >= k && ord.gteq(a, b.last)) b
      else {
        val i = b.indexWhere(r => ord.lt(a, r))
        val (pre, post) = if (i < 0) (b, Seq.empty) else b.splitAt(i)
        ((pre :+ a) ++ post).take(k)
      }
    override def merge(b1: Seq[CustRow], b2: Seq[CustRow]): Seq[CustRow] = best(b1 ++ b2)
    override def finish(r: Seq[CustRow]): Seq[CustRow] = r
    override def bufferEncoder: Encoder[Seq[CustRow]] = Encoders.kryo[Seq[CustRow]]
    override def outputEncoder: Encoder[Seq[CustRow]] = Encoders.kryo[Seq[CustRow]]
  }

  /** Same rows as WindowOps.topkWindow, computed with the bounded-buffer
    * aggregator instead of a window sort.
    */
  def topkAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 5
    val ds = Tables.load(GraftSession.tuned(s), dir, "customer")
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_name"),
        col("c_acctbal").as("acctbal_raw"),
        col("c_acctbal").cast(DecimalType(12, 2)).cast(DoubleType).as("acctbal"))
      .as[CustRow]
    ds.groupByKey(_.c_mktsegment)
      .agg(new TopKCustomers(k).toColumn.name("topk"))
      .flatMap { case (seg, rows) =>
        rows.zipWithIndex.map { case (r, i) =>
          (seg, i + 1, r.c_custkey, r.c_name, r.acctbal)
        }
      }
      .toDF("c_mktsegment", "rn", "c_custkey", "c_name", "acctbal")
      .orderBy("c_mktsegment", "rn")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_topk_agg", "typed bounded-buffer top-k Aggregator (scale twin of q_topk_window)",
      topkAgg,
      Some(
        """SELECT c_mktsegment, rn, c_custkey, c_name, acctbal FROM (
          |  SELECT c_mktsegment, c_custkey, c_name,
          |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
          |         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
          |  FROM customer
          |) WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin)),
  )
}
