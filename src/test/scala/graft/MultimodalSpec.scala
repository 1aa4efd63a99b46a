package graft

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, Similarity}

/** Multimodal plumbing + IVF ANN behavior. */
class MultimodalSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("typed mapPartitions decode: one feature row per asset, bounded values, partition count preserved") {
    val assets = Multimodal.assets(docs)
    val decoded = Multimodal.typedDecode(spark, assets)
    assert(decoded.rdd.getNumPartitions == assets.rdd.getNumPartitions)
    val rows = decoded.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(_.features.forall(f => f >= 0.0 && f < 1.0)))
    // deterministic fake: same input -> same features
    val again = Multimodal.typedDecode(spark, assets).collect()
      .map(r => r.asset_id -> r.features.toSeq).toMap
    assert(rows.forall(r => again(r.asset_id) == r.features.toSeq))
  }

  test("frame sampling: every other 64-byte frame, remainder in last frame") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assets(docs), frameBytes = 64, stride = 2)
    val byAsset = frames
      .groupBy("asset_id").agg(count(lit(1)).as("n"), sum(octet_length(col("frame"))).as("bytes"))
      .join(docs.select(col("doc_id").as("asset_id"), octet_length(encode(col("text"), "UTF-8")).as("n_bytes")), "asset_id")
      .collect()
    byAsset.foreach { r =>
      val nBytes = r.getAs[Int]("n_bytes")
      val totalChunks = math.ceil(nBytes / 64.0).toInt
      val expected = (0 until totalChunks).count(_ % 2 == 0)
      assert(r.getAs[Long]("n") == expected, s"asset ${r.getAs[Long]("asset_id")}")
    }
  }

  test("IVF top-k: includes self, subset of brute-force prefix, plan prunes to probed lists") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = Similarity.ivfTopK(emb, queryVecId = 0L, k = 5, numLists = 8, nProbe = 3)
    // the nProbe pruning must survive as an ivf_list IN (...) filter —
    // without it the "ANN" silently degrades to a full scan. (Checked on
    // the ANALYZED plan: the optimizer collapses the ivf_list alias into
    // the filter expression, hiding the name.)
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("ivf_list") && plan.contains(" IN ("),
      s"probe filter missing from plan:\n$plan")
    val ivf = df.collect()
    assert(ivf.head.getAs[Long]("vec_id") == 0L)
    val brute = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 30)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ivf.map(_.getAs[Long]("vec_id")).toSet.subsetOf(brute))
  }

  test("IVF lists written partitionBy(ivf_list) give partition-pruned probes") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val assigned = Similarity.withIvfList(emb, Similarity.sampleCentroids(emb, 8))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    graft.operators.ScaleOps.writePartitioned(assigned, s"$tmp/lists", "ivf_list")
    // probing nProbe lists = reading nProbe directories; the plan must
    // prune on the partition column (the PLANS.md 100 TB probe layout)
    val probe = spark.read.parquet(s"$tmp/lists").where(col("ivf_list").isin(0, 1, 2))
    val plan = probe.queryExecution.executedPlan.toString
    // every scan prints "PartitionFilters: [...]" — the filter must be
    // INSIDE the brackets, not in a post-scan Filter node
    assert("PartitionFilters: \\[[^\\]]*ivf_list".r.findFirstIn(plan).isDefined,
      s"probe read not partition-pruned:\n$plan")
    assert(probe.count() ==
      assigned.where(col("ivf_list").isin(0, 1, 2)).count())
  }

  test("binaryFile source ingests raw payloads with metadata, glob-filtered") {
    // the ingestion front door for real image/audio payloads: Spark's
    // binaryFile source yields (path, modificationTime, length, content)
    // — the schema Multimodal's decode stages consume
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)
    val txt = "not a payload".getBytes("UTF-8")
    java.nio.file.Files.write(dir.resolve("a.png"), png)
    java.nio.file.Files.write(dir.resolve("b.png"), png ++ png)
    java.nio.file.Files.write(dir.resolve("skip.txt"), txt)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir.toString)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val rows = df.select("path", "length", "content").collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).length))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(("a.png", 8L, 8), ("b.png", 16L, 16)),
      "glob filter must exclude skip.txt; length must match content")
  }

  test("nested-field pruning: selecting one struct field prunes the parquet ReadSchema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nest").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        struct(col("lang").as("lang"), col("source").as("source"),
          col("n_chars").as("n_chars")).as("meta"),
        col("text"))
      .write.mode("overwrite").parquet(s"$tmp/nested")
    val picked = spark.read.parquet(s"$tmp/nested")
      .select(col("doc_id"), col("meta.lang"))
    val scan = picked.queryExecution.executedPlan.toString
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(scan).getOrElse("")
    assert(read.contains("lang"), s"missing picked field in $read")
    assert(!read.contains("text") && !read.contains("n_chars"),
      s"scan reads unpicked columns — nested pruning lost: $read")
  }

  test("IVF assignment: every vector lands in exactly one existing list") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Similarity.sampleCentroids(emb, 8)
    val assigned = Similarity.withIvfList(emb, centroids)
    assert(assigned.count() == emb.count())
    val lists = assigned.select("ivf_list").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lists.subsetOf(centroids.map(_._1).toSet))
    assert(lists.nonEmpty)
  }

  test("audio PCM windows match a plain-JVM 16-bit big-endian mirror (loudness + zero crossings)") {
    import spark.implicits._
    // non-ASCII chars put bytes >= 0x80 in the stream, so some samples
    // parse NEGATIVE (two's complement) and the sign-crossing path runs;
    // 150 chars ≈ 2+ full 64-byte windows with a dropped remainder
    val text = (0 until 50).map(i => s"a${('é' + i % 3).toChar}").mkString // 50 × 3 bytes
    val docs = Seq((7L, text), (8L, "short")).toDF("doc_id", "text")
    val got = graft.ext.Multimodal.audioFeatures(graft.ext.Multimodal.assets(docs))
      .orderBy("asset_id", "window_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // JVM mirror
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val expect = (0 until bytes.length / 64).map { w =>
      val samples = (0 until 32).map { si =>
        val off = w * 64 + si * 2
        val u = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
        if (u >= 32768) u - 65536 else u
      }
      val zc = samples.sliding(2).count(p => p.head.toLong * p(1) < 0)
      (7L, w, samples.map(v => math.abs(v.toLong)).sum, zc)
    }
    assert(got.toSeq == expect, s"spark ${got.toSeq} != jvm $expect")
    assert(expect.exists(_._4 > 0), "crafted text must exercise sign crossings")
    assert(!got.exists(_._1 == 8L), "sub-window asset must drop entirely")
  }

  test("payload dedup: planted byte-identical assets counted, savings exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same bytes", "en", "web", 10L),
      (2L, "same bytes", "en", "web", 10L),
      (3L, "same bytes", "en", "web", 10L),
      (4L, "unique one", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.ext.Multimodal.payloadDedupStats(docs).head()
    assert(r.getAs[Long]("n_assets") == 4L)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Long]("n_dup_copies") == 2L)
    assert(r.getAs[Long]("bytes_total") == 40L)
    assert(r.getAs[Long]("bytes_unique") == 20L)
    assert(r.getAs[Long]("bytes_saved") == 20L)
    assert(r.getAs[Double]("unique_fraction") == 0.5)
  }

  test("media sniff: truthful, lying, and magicless payloads land in the right census cells") {
    import spark.implicits._
    // doc 0: magic jpeg (0%7), declared jpeg (0%5)  -> truthful
    // doc 5: magic zip (5%7),  declared jpeg (5%5=0) -> metadata lie
    // doc 6: no magic (6%7),   declared png (6%5=1)  -> sniffs text
    val docs = Seq((0L, "aa", "en", "web", 2L), (5L, "bb", "en", "web", 2L),
      (6L, "cc", "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.Multimodal.sniffReport(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("total_bytes")))).toMap
    assert(out == Map(
      ("image/jpeg", "image/jpeg") -> ((1L, 6L)),           // 4 magic + 2 text bytes
      ("image/jpeg", "application/zip") -> ((1L, 6L)),
      ("image/png", "text/plain") -> ((1L, 2L))))
  }

  test("graft_cdc_boundaries: native single-pass equals the declarative HOF/md5 recipe on the fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val txt = coalesce(col("text"), lit(""))
    val base = docs.select(col("doc_id"),
        hex(encode(txt, "UTF-8")).as("hx"),
        encode(txt, "UTF-8").as("bin"),
        octet_length(txt).as("n"))
      .where(col("n") >= 4)
    val cmp = base.select(col("doc_id"),
      expr("graft_cdc_boundaries(bin, 64)").as("fast"),
      expr(
        """CASE WHEN n - 3 >= 2 THEN
          |  filter(transform(sequence(2, n - 3),
          |    i -> CASE WHEN CAST(conv(substring(md5(substring(hx,
          |           (i - 1) * 2 + 1, 8)), 25, 8), 16, 10) AS BIGINT)
          |           % 64 = 0 THEN i END),
          |    x -> x IS NOT NULL)
          |ELSE CAST(array() AS ARRAY<INT>) END""".stripMargin).as("slow"))
    assert(cmp.count() > 0)
    val bad = cmp.where(not(col("fast") <=> col("slow"))).count()
    assert(bad == 0, s"$bad rows diverge between native and HOF boundary recipes")
  }

  test("content-defined chunking: spans tile the payload; a prefix edit re-aligns, fixed blocks would not") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val body = (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (1L, body, "en", "web", body.length.toLong),
      // 3-byte insertion at the front: every fixed-offset block would
      // change, but CDC boundaries derive from content, so all chunks
      // after the first boundary must be byte-identical to doc 1's
      (2L, "xyz" + body, "en", "web", body.length + 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ch = graft.ext.Multimodal.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    // spans tile each payload exactly: starts contiguous, lens sum to n
    Seq(1L -> body.length, 2L -> (body.length + 3)).foreach { case (id, n) =>
      val spans = ch.filter(_._1 == id).sortBy(_._2)
      assert(spans.head._3 == 1, "first chunk starts at byte 1")
      spans.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap in doc $id")
        case _ =>
      }
      assert(spans.map(_._4).sum == n, s"doc $id spans must cover all $n bytes")
    }
    // content-defined re-alignment: past the first boundary the chunk
    // digest streams coincide
    val d1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._5).drop(1)
    val d2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._5).drop(1)
    assert(d1.nonEmpty && d1.sameElements(d2),
      s"downstream chunks must re-align: ${d1.length} vs ${d2.length}")
  }

  test("imageDims: JPEG SOF walk and PNG IHDR parse real header structures") {
    import graft.functions.HashImpls.imageDims
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(java.lang.Integer.parseInt(_, 16).toByte).toArray
    // JPEG: SOI + APP0(16) + COM(5) + SOF0 with h=0x0102, w=0x0304
    val jpeg = hx("FFD8 FFE0 0010 4A46494600 0101 00 0048 0048 0000" +
      "FFFE 0005 585858" +
      "FFC0 0011 08 0102 0304 03 011100 021101 031101")
    assert(imageDims(jpeg) == (0x0304L << 32 | 0x0102L),
      "width from SOF bytes 7-8, height from 5-6")
    // SOF2 (progressive) is a frame header too
    val jpeg2 = hx("FFD8 FFC2 0011 08 0010 0020 03 011100 021101 031101")
    assert(imageDims(jpeg2) == (0x20L << 32 | 0x10L))
    // DHT (C4) is NOT a frame header — the walker must skip it
    val jpegDht = hx("FFD8 FFC4 0003 00 FFC0 0011 08 0001 0002 03 011100 021101 031101")
    assert(imageDims(jpegDht) == (2L << 32 | 1L))
    // marker desync, truncation, bad length -> -1, never garbage
    assert(imageDims(hx("FFD8 00C0 0011")) == -1L)
    assert(imageDims(hx("FFD8 FFE0")) == -1L)
    assert(imageDims(hx("FFD8 FFFE 0001 FFC0")) == -1L)
    assert(imageDims("plain text".getBytes("UTF-8")) == -1L)
    assert(imageDims(Array.emptyByteArray) == -1L)
    // PNG: signature + IHDR, width 0x0000_0141, height 0x0000_00F0
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000141 000000F0 0806000000")
    assert(imageDims(png) == (0x141L << 32 | 0xF0L))
    // corrupt signature byte -> -1
    val bad = png.clone(); bad(6) = 0x00
    assert(imageDims(bad) == -1L)
  }

  test("q_image_dims: planted headers round-trip the doc_id-derived dims; text rows are NULL") {
    val out = graft.ext.Multimodal.imageDimsQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 2) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"doc $id must not parse")
      } else {
        assert(r.getInt(1) == (id % 1009 + 16).toInt, s"width of $id")
        assert(r.getInt(2) == (id % 997 + 16).toInt, s"height of $id")
      }
    }
  }
}
