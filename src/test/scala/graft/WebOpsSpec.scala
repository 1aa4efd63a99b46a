package graft

import graft.ext.WebOps

/** Web-crawl operators: hand-checked URL decomposition, boilerplate
  * stripping, anchor harvesting, and the politeness invariant of the
  * frontier scheduler — all on crafted documents rows.
  */
class WebOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("urlParse: parse_url recovers every planted component") {
    val d = docs((42L, "hello world", "en", "src3", 11L))
    val r = WebOps.urlParse(d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("url") ==
      "https://src3.example.com/en/doc-42?ref=r0&p=3")
    assert(row.getAs[String]("host") == "src3.example.com")
    assert(row.getAs[String]("path") == "/en/doc-42")
    assert(row.getAs[String]("ref") == "r0")   // 42 % 7 = 0
    assert(row.getAs[String]("p") == "3")      // 42 % 13 = 3
  }

  test("domainStats: per-host census aggregates docs, langs, chars") {
    val d = docs(
      (1L, "a", "en", "srcA", 10L),
      (2L, "b", "fr", "srcA", 30L),
      (3L, "c", "en", "srcB", 5L))
    val r = WebOps.domainStats(d).collect()
      .map(x => x.getAs[String]("host") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_langs"),
          x.getAs[Long]("total_chars"), x.getAs[Double]("avg_chars"))))
      .toMap
    assert(r == Map(
      "srcA.example.com" -> ((2L, 2L, 40L, 20.0)),
      "srcB.example.com" -> ((1L, 1L, 5L, 5.0))))
  }

  test("htmlStrip: boilerplate dies, body text and title survive") {
    val d = docs((7L, "real body text", "de", "srcX", 14L))
    val row = WebOps.htmlStrip(d).collect().head
    assert(row.getAs[String]("title") == "Doc 7 (de)")
    assert(row.getAs[String]("clean_prefix") == "Doc 7 (de) real body text")
    val kept = row.getAs[Double]("kept_ratio")
    assert(kept > 0 && kept < 0.5, s"boilerplate should dominate: $kept")
    // nav/script content must not leak into the cleaned text
    assert(!row.getAs[String]("clean_prefix").contains("home"))
  }

  test("htmlStrip: null text still yields a well-formed page") {
    val d = Seq((9L, null.asInstanceOf[String], "en", "srcN", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = WebOps.htmlStrip(d).collect().head
    assert(row.getAs[String]("title") == "Doc 9 (en)")
    assert(row.getAs[Int]("clean_len") > 0)
  }

  test("anchorText: href/text pairs round-trip through the markup parse") {
    // doc 5: first word "alpha", lang "fr" → targets d5 / d5 (5%23=5, 5%17=5)
    // doc 40: first word "beta", lang "en" → d17 (40%23) / d6 (40%17)
    val d = docs(
      (5L, "alpha beta", "fr", "s", 10L),
      (40L, "beta gamma", "en", "s", 10L))
    val r = WebOps.anchorText(d).collect()
      .map(x => x.getAs[String]("host") ->
        ((x.getAs[Long]("n_anchors"), x.getAs[Long]("n_terms"),
          x.getAs[String]("first_term"))))
      .toMap
    assert(r == Map(
      "d5.example.org" -> ((2L, 2L, "alpha")),  // doc 5's both links
      "d17.example.org" -> ((1L, 1L, "beta")),
      "d6.example.org" -> ((1L, 1L, "en"))))
  }

  test("urlCanon: case, www, port, fragment, utm, sort, trailing slash all normalize") {
    val d = docs((42L, "x", "en", "src3", 10L))
    val row = WebOps.urlCanon(d).collect().head
    assert(row.getAs[String]("url") ==
      "HTTPS://WWW.SRC3.Example.COM:443/en/doc-42/?utm_source=feed&b=2&utm_campaign=c0&a=0#sec-2")
    assert(row.getAs[String]("canon") ==
      "https://src3.example.com/en/doc-42?a=0&b=2")
    assert(row.getAs[Int]("n_dropped_params") == 2)
  }

  test("urlCanon: two messy spellings of one resource share a canon key") {
    // same doc_id ⇒ same canon regardless of the planted mess — the
    // dedup-key property; different doc_id ⇒ different canon
    val d = docs((7L, "x", "en", "srcA", 1L), (8L, "x", "en", "srcA", 1L))
    val canons = WebOps.urlCanon(d).collect().map(_.getAs[String]("canon"))
    assert(canons.distinct.length == 2)
    assert(canons.forall(c => c.startsWith("https://srca.example.com/en/doc-")))
  }

  test("crawlFrontier: each wave touches a host at most once, priority order holds") {
    val d = docs(
      (1L, "x", "en", "srcA", 100L),
      (2L, "x", "en", "srcA", 300L),
      (3L, "x", "en", "srcA", 200L),
      (4L, "x", "en", "srcA", 50L),   // wave 4 → cut at waves=3
      (5L, "x", "en", "srcB", 10L))
    val rows = WebOps.crawlFrontier(d, waves = 3).collect()
      .map(x => (x.getAs[String]("host"), x.getAs[Int]("wave"),
        x.getAs[Long]("doc_id")))
    assert(rows.toSeq == Seq(
      ("srcA.example.com", 1, 2L),   // 300 chars first
      ("srcA.example.com", 2, 3L),
      ("srcA.example.com", 3, 1L),
      ("srcB.example.com", 1, 5L)))
    // politeness: (host, wave) unique
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }
}
