package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TopK

/** Semantic pins for the 2-D skyline: brute-force dominance parity on
  * the fixture, planted geometries, and the bucket-prefilter soundness
  * edges (single price, total ties, anti-correlated worst case).
  */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def partsOf(rows: Seq[(Long, Double, Int)]): DataFrame =
    rows.map { case (k, price, size) =>
      (k, s"part$k", "B", "T", size, price)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")

  /** O(n²) reference: strict dominance in at least one dimension. */
  private def brute(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filterNot { case (_, pr, sz) =>
      rows.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(_._1).toSet

  private def run(rows: Seq[(Long, Double, Int)], buckets: Int = 64): Set[Long] =
    TopK.skyline(partsOf(rows), buckets).collect()
      .map(_.getAs[Long]("p_partkey")).toSet

  test("skyline == brute-force dominance on the sf0.001 part table") {
    val parts = graft.engine.Tables.load(spark, sfDir, "part")
      .select("p_partkey", "p_retailprice", "p_size")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSeq
    val got = TopK.skyline(graft.engine.Tables.load(spark, sfDir, "part"))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got == brute(parts))
    assert(got.nonEmpty && got.size < parts.size, "fixture frontier is a proper subset")
  }

  test("planted: cheaper-and-bigger dominates; ties on both axes all survive") {
    // (1) dominated by (2); (3)=(4) tie on both axes -> both survive;
    // (5) unique cheapest, (6) unique biggest
    val rows = Seq(
      (1L, 50.0, 10), (2L, 40.0, 12),
      (3L, 60.0, 20), (4L, 60.0, 20),
      (5L, 10.0, 1), (6L, 99.0, 30))
    assert(run(rows) == brute(rows))
    assert(run(rows) == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("same-price tie keeps only the max size; same-size tie keeps only the cheapest") {
    val rows = Seq((1L, 40.0, 5), (2L, 40.0, 9), (3L, 70.0, 9))
    assert(run(rows) == Set(2L))
  }

  test("degenerate buckets: all one price, and anti-correlated all-frontier") {
    val onePrice = Seq((1L, 10.0, 3), (2L, 10.0, 7), (3L, 10.0, 7))
    assert(run(onePrice) == Set(2L, 3L))
    // price and size both increasing: nothing dominates anything
    val anti = (1L to 20L).map(i => (i, i * 10.0, i.toInt))
    assert(run(anti) == anti.map(_._1).toSet)
  }

  test("bucket count does not change the answer (prefilter is sound at any granularity)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, 100.0 + rnd.nextInt(5000) / 100.0, 1 + rnd.nextInt(50)))
    val want = brute(rows)
    assert(run(rows, buckets = 1) == want)
    assert(run(rows, buckets = 7) == want)
    assert(run(rows, buckets = 256) == want)
  }
}
