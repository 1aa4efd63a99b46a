package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.TrainingPipeline

/** The end-to-end corpus pipeline: planted duplicates die at their
  * specific stages, counts fall monotonically, splits partition the
  * clean corpus exactly, and a re-run reproduces identical outputs.
  */
class TrainingPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("pipeline: planted dups die, counts monotone, splits exact, deterministic") {
    // Plant three docs whose length exceeds the sample cap (P(keep)=1,
    // so the weighted sampler can NEVER be the reason they vanish —
    // absence from the clean corpus proves the dedup stages):
    //   A (900001) = donor text + 400 unique filler tokens (survivor)
    //   B (900002) = A + " tail token"  -> near-duplicate of A
    //   C (900003) = exact copy of A    -> exact duplicate (min id wins)
    // 400 fillers keep Jaccard(donor, A) well under the 0.5 threshold,
    // so A never clusters with the donor itself.
    val base = docs.limit(200)
    val donor = base.orderBy("doc_id").limit(1).collect().head
    val filler = (0 until 400).map(i => s"filler$i").mkString(" ")
    val aText = donor.getAs[String]("text") + " " + filler
    def planted(id: Long, text: String) =
      Seq((id, text, donor.getAs[String]("lang"),
        donor.getAs[String]("source"), text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = base
      .unionByName(planted(900001L, aText))
      .unionByName(planted(900002L, aText + " tail token"))
      .unionByName(planted(900003L, aText))

    // the planted docs are deliberate length outliers (cap-saturated),
    // so the z gate is opened wide — this test pins the dedup stages
    val cfg = TrainingPipeline.Config(maxAbsZ = 1e9)
    val out = Files.createTempDirectory("graft-pipeline").toString
    val r = TrainingPipeline.run(corpus, out, cfg)

    assert(r.input == 203L)
    assert(r.afterQuality <= r.input)
    assert(r.afterExactDedup < r.afterQuality, "planted exact dup must die")
    assert(r.afterNearDup < r.afterExactDedup, "planted near dup must die")
    assert(r.afterSample <= r.afterNearDup)
    assert(r.trainDocs + r.valDocs + r.testDocs == r.afterSample,
      "splits must partition the clean corpus exactly")
    assert(r.batches >= 1 && r.batches <= r.trainDocs)

    // A survives (cap-saturated sample keeps it with certainty); B and
    // C are gone — and since both are also cap-saturated, only the
    // dedup stages can have removed them
    val cleanIds = spark.read.parquet(s"$out/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanIds(900001L), "survivor A must reach the clean corpus")
    assert(!cleanIds(900002L), "near-dup B must die in keep-one")
    assert(!cleanIds(900003L), "exact-dup C must die in exact dedup")

    // clean corpus n_chars matches the shipped text (recomputed
    // post-redaction)
    val mismatch = spark.read.parquet(s"$out/clean")
      .where(col("n_chars") =!= length(col("text"))).count()
    assert(mismatch == 0L, "n_chars must describe the shipped text")

    // train shards carry a batch assignment and no split leakage
    val trainIds = spark.read.parquet(s"$out/train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val valIds = spark.read.parquet(s"$out/val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.intersect(valIds).isEmpty)

    // determinism: a second run over the same input reproduces the
    // report and the exact train membership
    val out2 = Files.createTempDirectory("graft-pipeline2").toString
    val r2 = TrainingPipeline.run(corpus, out2, cfg)
    assert(r2 == r)
    val trainIds2 = spark.read.parquet(s"$out2/train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds2 == trainIds)
  }

  test("pipeline: URL-canonical crawl dedup and CDC chunk dedup kill their planted dups") {
    // Three planted docs, each engineered to die (or survive) at ONE
    // specific optional stage:
    //   A (900001) — donor text + 300 LONG (~30-char) shared-payload
    //     tokens; messy URL (case, www, :443, utm params, fragment).
    //     Survives everything: cap-saturated, first occurrence.
    //   U (900002) — unique cap-saturated text, but a URL that
    //     canonicalizes EQUAL to A's → must die at stage 0 (min doc_id
    //     wins), and nothing else could remove it (unique content,
    //     P(keep)=1).
    //   S (900003) — 500 SHORT junk tokens + A's text: byte-wise ~75%
    //     duplicated CDC chunks (dies at the chunk stage) while its
    //     bigram-shingle Jaccard vs A is ~0.4 < the 0.5 near-dup
    //     threshold — so the near-dup stage CANNOT be what kills it.
    val base = docs.limit(200)
      .withColumn("url",
        concat(lit("https://example.com/d/"), col("doc_id")))
    val donor = base.orderBy("doc_id").limit(1).collect().head
    val filler = (0 until 300)
      .map(i => f"sharedpayloadtokennumber$i%04dpadpadpad").mkString(" ")
    val aText = donor.getAs[String]("text") + " " + filler
    val junk = (0 until 500).map(i => s"j$i").mkString(" ")
    def planted(id: Long, text: String, url: String) =
      Seq((id, text, donor.getAs[String]("lang"),
        donor.getAs[String]("source"), text.length.toLong, url))
        .toDF("doc_id", "text", "lang", "source", "n_chars", "url")
    val uText = (0 until 400).map(i => s"uniqvocab$i").mkString(" ")
    val corpus = base
      .unionByName(planted(900001L, aText,
        "HTTPS://WWW.Example.COM:443/page/1?utm_source=feed&a=1#top"))
      .unionByName(planted(900002L, uText,
        "https://example.com/page/1?a=1"))
      .unionByName(planted(900003L, junk + " " + aText,
        "https://example.com/unique/s"))

    val cfg = TrainingPipeline.Config(maxAbsZ = 1e9,
      urlDedupCol = Some("url"), chunkDupMaxFrac = Some(0.6))
    val out = Files.createTempDirectory("graft-pipeline-crawl").toString
    val r = TrainingPipeline.run(corpus, out, cfg)

    assert(r.input == 203L)
    assert(r.afterUrlDedup == 202L,
      "exactly the planted utm-variant refetch must die at stage 0")
    assert(r.afterChunkDedup < r.afterExactDedup,
      "the planted shifted copy must die at the chunk stage")
    assert(r.afterChunkDedup >= r.afterNearDup)

    val cleanIds = spark.read.parquet(s"$out/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanIds(900001L), "first-occurrence A must survive " +
      "(its chunks are self-owned; donor overlap is far below the cut)")
    assert(!cleanIds(900002L), "canonical-URL refetch U must die")
    assert(!cleanIds(900003L), "shifted chunk-copy S must die")

    // rerun-determinism holds with both optional stages on
    val out2 = Files.createTempDirectory("graft-pipeline-crawl2").toString
    assert(TrainingPipeline.run(corpus, out2, cfg) == r)
  }

  test("pipeline: NULL and unparseable URLs bypass crawl dedup (r9 ADVICE footgun)") {
    // canonicalUrl maps every URL without a scheme://host onto the
    // same degenerate key; a keep-one over that key would silently
    // delete all but one such doc. Plant: 3 NULL-url docs, 3
    // relative-url docs ('/p/<id>'), 2 genuine refetch twins, and a
    // well-formed unique-URL tail. Stage 0 must remove EXACTLY one
    // doc (the refetch twin) and keep every NULL/relative-url doc.
    val base = docs.limit(50)
      .withColumn("url",
        when(col("doc_id") % 17 === 0, lit(null).cast("string"))
          .when(col("doc_id") % 17 === 1,
            concat(lit("/p/"), col("doc_id")))
          .otherwise(concat(lit("https://example.com/d/"), col("doc_id"))))
    val twin = base.where(col("doc_id") % 17 >= 2).orderBy("doc_id").limit(1)
      .select((col("doc_id") + 900100L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"),
        // same canonical key as the original (www + utm noise)
        concat(lit("https://WWW.example.com/d/"), col("doc_id"),
          lit("?utm_source=x")).as("url"))
    val corpus = base.unionByName(twin)
    val n = corpus.count()
    val nUnparseable = corpus.where(
      col("url").isNull || !col("url").rlike("^[A-Za-z]+://")).count()
    assert(nUnparseable >= 2, "fixture must actually plant unparseable URLs")

    val cfg = TrainingPipeline.Config(maxAbsZ = 1e9,
      urlDedupCol = Some("url"))
    val out = Files.createTempDirectory("graft-pipeline-nullurl").toString
    val r = TrainingPipeline.run(corpus, out, cfg)
    assert(r.input == n)
    assert(r.afterUrlDedup == n - 1,
      "exactly the refetch twin dies; NULL/relative-url docs all survive")
  }

  test("pipeline: line-clean stage strips boilerplate lines, drops mostly-boilerplate docs") {
    // Plant on top of a 50-doc base (whose synthetic texts have no
    // newlines, so stage 1.5 leaves them untouched):
    //   D (900301): long real text + ONE boilerplate line ("Sign in")
    //     -> the line is stripped (text shrinks), the doc SURVIVES
    //   E (900302): three boilerplate lines + one short real line
    //     -> removed chars far exceed 5%, the doc DIES at stage 1.5
    val base = docs.limit(50)
    val donor = base.orderBy("doc_id").limit(1).collect().head
    def planted(id: Long, text: String) =
      Seq((id, text, donor.getAs[String]("lang"),
        donor.getAs[String]("source"), text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // 300 pads push D past the 1000-char sample cap (P(keep)=1, the
    // sampler can never be why it vanishes) and dwarf the planted
    // boilerplate line (removed frac well under 5%)
    val longText = donor.getAs[String]("text") + " " +
      (0 until 300).map(i => s"pad$i").mkString(" ")
    val corpus = base
      .unionByName(planted(900301L, longText + "\nSign in"))
      .unionByName(planted(900302L,
        "SHOUTING NAV MENU\n42 likes\nSign in to continue\nshort real line here."))
    val n = corpus.count()

    val cfg = TrainingPipeline.Config(maxAbsZ = 1e9, lineClean = true)
    val out = Files.createTempDirectory("graft-pipeline-lineclean").toString
    val r = TrainingPipeline.run(corpus, out, cfg)
    assert(r.input == n)
    assert(r.afterLineClean == n - 1,
      "exactly the mostly-boilerplate doc dies at stage 1.5")
    val clean = spark.read.parquet(s"$out/clean")
    val d = clean.where(col("doc_id") === 900301L).select("text").collect()
    assert(d.length == 1 && d.head.getString(0) == longText,
      "the surviving doc's boilerplate line is stripped, real text intact")
    assert(clean.where(col("doc_id") === 900302L).isEmpty)

    // stage off -> field reports -1 and both planted docs reach stage 2
    val rOff = TrainingPipeline.run(corpus,
      Files.createTempDirectory("graft-pipeline-lineclean-off").toString,
      TrainingPipeline.Config(maxAbsZ = 1e9))
    assert(rOff.afterLineClean == -1L)
  }

  test("pipeline: gopher stage kills the repetitive doc, keeps the clean one") {
    // G-good: 150 DISTINCT 8-char words + 2 stop words — passes both
    //   batteries (mean len ~7.9, no repetition, cap-saturated).
    // G-bad: 10 identical boilerplate lines + a DIFFERENT 150-word
    //   vocabulary tail — passes the quality battery (words/length/
    //   stopwords fine) but dup_line_frac = 10/11 >> 0.30 fails the
    //   repetition battery. Disjoint vocab from G-good keeps Jaccard
    //   ~0, so near-dup cannot be what kills it; cap saturation rules
    //   out the sampler. ONLY the gopher stage can remove it.
    def vocabText(prefix: String) =
      "the and " + (1 to 150).map(i => f"$prefix$i%03dxx").mkString(" ")
    def planted(id: Long, text: String) =
      Seq((id, text, "en", "web", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.limit(50)
      .unionByName(planted(900031L, vocabText("word")))
      .unionByName(planted(900032L,
        ("some repeated boilerplate line\n" * 10) + vocabText("zword")))

    val cfg = TrainingPipeline.Config(maxAbsZ = 1e9, gopherQuality = true)
    val out = Files.createTempDirectory("graft-pipeline-gopher").toString
    val r = TrainingPipeline.run(corpus, out, cfg)
    assert(r.afterGopher < r.afterQuality,
      "the gopher stage must remove at least the planted repetitive doc")
    val cleanIds = spark.read.parquet(s"$out/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanIds(900031L), "the clean planted doc must survive gopher")
    assert(!cleanIds(900032L), "the repetitive doc must die at gopher")
  }

  test("pipeline: duplicate doc_id in the corpus fails the uniqueness gate") {
    // two DIFFERENT cap-saturated texts sharing one id: both certainly
    // survive every stage (distinct content, P(keep)=1), so the clean
    // corpus must contain the id twice and the gate must fire
    def longDoc(id: Long, vocab: String) = {
      val text = (0 until 400).map(i => s"$vocab$i").mkString(" ")
      Seq((id, text, "en", "web", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    val corpus = docs.limit(20)
      .unionByName(longDoc(900010L, "alpha"))
      .unionByName(longDoc(900010L, "beta"))
    val out = Files.createTempDirectory("graft-pipeline-dup").toString
    val ex = intercept[IllegalArgumentException] {
      TrainingPipeline.run(corpus, out, TrainingPipeline.Config(maxAbsZ = 1e9))
    }
    assert(ex.getMessage.contains("duplicate doc_id"))
  }

  test("pipeline: empty corpus flows through without error; reportCounts=false skips stage jobs") {
    val empty = docs.where(lit(false))
    val out = Files.createTempDirectory("graft-pipeline-empty").toString
    val r = TrainingPipeline.run(empty, out,
      TrainingPipeline.Config(reportCounts = false))
    assert(r.input == -1L && r.afterQuality == -1L)
    assert(r.afterSample == 0L && r.batches == 0L)
  }
}
