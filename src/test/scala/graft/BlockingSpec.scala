package graft

import org.apache.spark.sql.functions._

import graft.ext.Blocking

/** Direct unit coverage for the shared oversized-group cap (the LSH
  * band / SimHash chunk / SemDeDup cluster / containment-df call sites
  * cover it transitively through their planted-skew specs; this pins
  * the helper's own contract).
  */
class BlockingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    ("hot", 1L), ("hot", 2L), ("hot", 3L), ("hot", 4L),
    ("warm", 5L), ("warm", 6L),
    ("cold", 7L)).toDF("bucket", "id")

  test("oversizedGroups returns exactly the keys past the cap, keys only") {
    val over = Blocking.oversizedGroups(corpus, Seq("bucket"), 3)
    assert(over.columns.toSeq == Seq("bucket"), "census must be join-ready keys")
    assert(over.as[String].collect().toSeq == Seq("hot"))
    assert(Blocking.oversizedGroups(corpus, Seq("bucket"), 2)
      .as[String].collect().toSeq == Seq("hot"),
      "the cap is strict: a group AT maxGroup survives")
    assert(Blocking.oversizedGroups(corpus, Seq("bucket"), 1)
      .as[String].collect().sorted.toSeq == Seq("hot", "warm"))
    assert(Blocking.oversizedGroups(corpus, Seq("bucket"), 7).count() == 0L,
      "a cap at the population is never exceeded")
  }

  test("pruneGroups drops only the census's rows; shared census prunes two sides consistently") {
    val census = Blocking.oversizedGroups(corpus, Seq("bucket"), 3)
    val left = Blocking.pruneGroups(corpus, census, Seq("bucket"))
    assert(left.select("id").as[Long].collect().sorted.toSeq ==
      Seq(5L, 6L, 7L))
    // a second relation pruned with the SAME census agrees on the
    // dropped buckets even where its own population differs
    val other = Seq(("hot", 10L), ("cold", 11L)).toDF("bucket", "id")
    assert(Blocking.pruneGroups(other, census, Seq("bucket"))
      .select("id").as[Long].collect().toSeq == Seq(11L))
  }

  test("dropOversized caps in one shot; Int.MaxValue short-circuits without a census scan") {
    assert(Blocking.dropOversized(corpus, Seq("bucket"), 3)
      .count() == 3L)
    val c = corpus
    assert(Blocking.dropOversized(c, Seq("bucket"), Int.MaxValue) eq c,
      "cap-off must return the input plan untouched")
    // multi-key grouping caps on the composite key, not either column
    val two = Seq((1, "a", 1L), (1, "a", 2L), (1, "b", 3L), (2, "a", 4L))
      .toDF("k1", "k2", "id")
    assert(Blocking.dropOversized(two, Seq("k1", "k2"), 1)
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }
}
