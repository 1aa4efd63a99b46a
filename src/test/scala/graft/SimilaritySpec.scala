package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Similarity-search invariants: native cosine correctness, top-k ⊆
  * sorted prefix, ANN recall vs brute force, near-dup planting.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("graft_cosine matches a driver-side computation") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(col("id"), expr("graft_cosine(a, b)").as("c"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(math.abs(rows(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1) - 0.0) < 1e-12)
    assert(math.abs(rows(2) - 8.0 / 9.0) < 1e-12) // (2+2+4)/(3*3)
  }

  test("brute-force top-k: self first, descending, k rows") {
    val out = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 10).collect()
    assert(out.length == 10)
    assert(out.head.getAs[Long]("vec_id") == 0L) // self-similarity = 1.0
    val sims = out.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("ANN top-k is a subset of a brute-force prefix and includes self") {
    val k = 5
    val ann = Similarity.lshTopK(emb, queryVecId = 0L, k = k)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ann.contains(0L))
    // every ANN hit must appear in the exact top-30 (multiprobe recall is
    // approximate but hits can't be arbitrarily bad on 50 vectors)
    val brute = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 30)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ann.subsetOf(brute), s"ANN returned far-from-top vectors: ${ann -- brute}")
  }

  test("ANN recall@10 vs exact top-10 at the registered configs (both oracle gates rely on 1.0)") {
    // both fixture SFs the driver exercises; sf0.1 is covered by AnnTune
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.collect().map(_.getAs[Long]("vec_id")).toSet
      val exact = ids(Similarity.bruteForceTopK(e, queryVecId = 0L, k = 10))
      val lsh = ids(Similarity.lshTopK(e, queryVecId = 0L, k = 10, probeRadius = 3))
      val ivf = ids(Similarity.ivfTopK(e, queryVecId = 0L, k = 10, nProbe = 8))
      val ivfpq = ids(Similarity.ivfPqTopK(e, queryVecId = 0L, k = 10))
      val lshRecall = (lsh & exact).size / 10.0
      val ivfRecall = (ivf & exact).size / 10.0
      val ivfpqRecall = (ivfpq & exact).size / 10.0
      info(s"recall@10 on $sf: lsh(r=3)=$lshRecall ivf(nProbe=8)=$ivfRecall ivfpq=$ivfpqRecall")
      assert(lshRecall == 1.0, s"$sf LSH recall@10 $lshRecall != 1.0 (oracle gate relies on this)")
      assert(ivfRecall == 1.0, s"$sf IVF recall@10 $ivfRecall != 1.0 (oracle gate relies on this)")
      assert(ivfpqRecall == 1.0, s"$sf IVF-PQ recall@10 $ivfpqRecall != 1.0 (oracle gate relies on this)")
    }
  }

  test("embedding near-dup finds a planted duplicate vector pair") {
    val v = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val dup = v.clone(); dup(0) = (v(0) + 0.01f)
    val other = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((0L, "a", v), (1L, "b", dup), (2L, "c", other))
      .toDF("vec_id", "label", "embedding")
    val pairs = Similarity.nearDupPairs(df, threshold = 0.95, numPlanes = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("plane table is deterministic and correctly sized") {
    val p1 = Similarity.planeTable(6, 16)
    val p2 = Similarity.planeTable(6, 16)
    assert(p1 == p2)
    assert(p1.size == 6 && p1.forall(_.size == 16))
    assert(p1.flatten.forall(w => w >= -1.0 && w < 1.0))
    assert(Similarity.planesFor(500) == 4)       // min clamp
    assert(Similarity.planesFor(1_000_000_000L) >= 20) // scales with N
  }

  test("int8 quantize: dequantization error <= scale/2, zero-vector safe") {
    val joined = Similarity.quantize(emb).join(emb, "vec_id")
      .select(col("vec_id"), col("scale"), col("qvec"), col("embedding"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val scale = r.getDouble(1)
      val qv = r.getSeq[Byte](2)
      val ev = r.getSeq[Float](3)
      assert(qv.length == ev.length)
      qv.zip(ev).foreach { case (q, x) =>
        assert(q >= -127 && q <= 127)
        assert(math.abs(q * scale - x) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: q=$q scale=$scale x=$x")
      }
    }
    val zq = Similarity.quantize(
      Seq((99L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")).collect().head
    assert(zq.getDouble(1) == 0.0)
    assert(zq.getSeq[Byte](2).forall(_ == 0))
  }

  test("label centroids: exact means on a crafted set; one row per (label, pos)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cent").toString
    Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 6.0f), 0),
      (3L, Array(10.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.labelCentroids(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows == Map(
      (0, 0) -> (2L, 2.0), (0, 1) -> (2L, 4.0),
      (1, 0) -> (1L, 10.0), (1, 1) -> (1L, 0.0)))
  }

  test("semanticDedup: flags match a plain-JVM within-label pairwise sweep") {
    val tau = 0.2
    val vecs = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = vecs.map { case (id, lbl, v) =>
      id -> vecs.count { case (pid, plbl, pv) =>
        plbl == lbl && pid < id && cos(v, pv) >= tau }.toLong
    }.toMap
    val got = Similarity.semanticDedup(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(got.length == vecs.length, "one row per vector")
    for ((id, n, flag) <- got) {
      assert(n == expect(id), s"vec $id prior-dup count")
      assert(flag == (if (expect(id) > 0) 1 else 0), s"vec $id flag")
    }
  }

  test("semanticDedup chain semantics: predecessor-filter drops the whole chain tail (documented over-delete vs greedy)") {
    // one cluster, three unit vectors at angles 0, θ, 2θ with
    // cos θ = 0.25: a∼b and b∼c (0.25 ≥ τ=0.2) but a≁c
    // (cos 2θ = 2·0.25² − 1 = −0.875 < τ). Greedy ε-ball keeps {a, c};
    // the implemented predecessor filter flags BOTH b and c.
    val th = math.acos(0.25)
    def unit(ang: Double) = Seq(math.cos(ang).toFloat, math.sin(ang).toFloat)
    val df = Seq(
      (0L, 7, unit(0)), (1L, 7, unit(th)), (2L, 7, unit(2 * th)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDedup(df, tau = 0.2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got(0L) == (0L, 0), "chain head survives")
    assert(got(1L) == (1L, 1), "b flagged via a")
    assert(got(2L) == (1L, 1), "c flagged via b — the documented over-delete")
  }

  test("semanticDedup skew cap: a planted hot cluster sub-blocks via SRP and still flags every scale-duplicate") {
    val dim = 16
    val nBase = 120
    // deterministic pseudo-random base vectors (the splitmix64 stream);
    // precondition below proves no accidental base-base near-dup exists,
    // so capped-vs-uncapped equality cannot be seed-flaky
    val base = Similarity.planeTable(nBase, dim, seed = 0x5eedL)
    def cosJ(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val maxBase = (for {
      i <- base.indices; j <- (i + 1) until nBase
    } yield cosJ(base(i), base(j))).max
    assert(maxBase < 0.9, s"seed precondition violated: max base cosine $maxBase")
    // hot cluster 1: 240 members (120 base + 120 scale-dups, same
    // DIRECTION so SRP buckets are bit-identical); small cluster 2: one
    // planted dup pair, must take the exact pairwise path
    val hot = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, 1, v.map(_.toFloat).toArray),
        ((i + 1000).toLong, 1, v.map(x => (2 * x).toFloat).toArray))
    }
    val smallC = Seq(
      (5000L, 2, base.head.map(x => (3 * x).toFloat).toArray),
      (5001L, 2, base.head.map(x => (5 * x).toFloat).toArray))
    val df = (hot ++ smallC).toDF("vec_id", "label", "embedding")
    val capped = Similarity.semanticDedup(df, tau = 0.95, maxCluster = 50)
    val uncapped = Similarity.semanticDedup(df, tau = 0.95)
    // the cap actually engaged: SRP sub-blocking in the capped plan only
    assert(capped.queryExecution.executedPlan.toString.contains("graft_srp_bucket"),
      "capped plan must sub-block the hot cluster via SRP")
    assert(!uncapped.queryExecution.executedPlan.toString.contains("graft_srp_bucket"),
      "under-cap clusters must keep the exact pairwise plan")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(rows(capped) == rows(uncapped),
      "sub-blocked result must equal exact pairwise on direction-identical dups")
    val flags = rows(capped).map(r => r._1 -> r._4).toMap
    base.indices.foreach { i =>
      assert(flags(i + 1000L) == 1, s"planted hot-cluster dup ${i + 1000} not flagged")
    }
    assert(flags(5001L) == 1, "small-cluster planted dup not flagged")
    assert(flags(5000L) == 0 && flags(0L) == 0, "cluster heads must survive")
  }

  test("semanticDedupKmeans: k-means cluster key flags planted scale-duplicates, nothing else") {
    // scale-dup of vec_id < 50 at exactly 2x: a power-of-two scale is
    // exact in float AND scales dot/norm exactly, so cosine to every
    // centroid is bit-identical and the dup lands in its base's cluster
    val baseE = emb.select("vec_id", "embedding").where(col("vec_id") < 200)
    val planted = baseE.where(col("vec_id") < 50).select(
      (col("vec_id") + 10000).as("vec_id"),
      expr("transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))")
        .as("embedding"))
    val got = Similarity.semanticDedupKmeans(
        baseE.unionByName(planted), tau = 0.95, k = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got.size == 250, "one row per vector")
    (0L until 50L).foreach { i =>
      assert(got(i + 10000) == 1, s"planted dup ${i + 10000} not flagged") }
    assert(got.count(_._2 == 1) == 50,
      "only the planted dups may be flagged on a near-orthogonal corpus")
  }

  test("PQ-ADC + exact re-rank reproduces the exact top-10; rerun-deterministic") {
    val emb = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toList
    val pq = Similarity.pqTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toList
    assert(pq == exact, "adaptive shortlist must cover the true top-10")
    val again = Similarity.pqTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toList
    assert(pq == again, "codebooks and codes must be rerun-stable")
  }

  test("PQ ADC score approximates the true dot product within measured error bounds") {
    val emb = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val (scores, _, _) = Similarity.pqAdcScores(emb, 0L, m = 8, kSub = 32, iters = 3)
    val joined = scores.join(
      Similarity.bruteForceTopK(emb, 0L, 100000)
        .select(col("vec_id"), col("cos_sim")), "vec_id")
      .select(col("adc"), col("cos_sim")).collect()
    // unit vectors: cos == dot; quantization error must be bounded well
    // below the similarity range or the shortlist would be useless
    val errs = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.max < 0.5, s"worst ADC error ${errs.max}")
    assert(errs.sum / errs.length < 0.12, s"mean ADC error ${errs.sum / errs.length}")
  }

  test("int8 quantization preserves cosine ranking: recall@10 >= 0.8 vs float") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = vecs.map { case (id, v) =>
      id -> cos(v.map(_.toDouble), q.map(_.toDouble)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val quant = Similarity.quantize(emb).collect()
      .map(r => (r.getLong(0),
        r.getDouble(1), r.getSeq[Byte](2).map(_.toDouble).toArray))
    val qq = quant.find(_._1 == 0L).get
    val approx = quant.map { case (id, scale, qv) =>
      // scales cancel inside cosine; dequantization only matters via rounding
      id -> cos(qv, qq._3) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.8, s"int8 recall@10 = $recall")
  }

  test("hard negatives: planted geometry — nearest different-label vector wins, ties break to lowest id") {
    import spark.implicits._
    // anchor 0 (label 0) points along e1; its same-label twin (id 5)
    // is MOST similar overall but must be skipped; ids 10/11 carry a
    // different label at cosines 0.8 vs 0.6; ids 20/21 duplicate the
    // best-negative direction exactly to force a tie for anchor 41
    val rows = Seq(
      (0L,  Array(1f, 0f), 0),
      (5L,  Array(0.999f, 0.04f), 0),   // same label: excluded
      (10L, Array(0.8f, 0.6f), 1),
      (11L, Array(0.6f, 0.8f), 1),
      (41L, Array(0f, 1f), 2),          // second anchor (41 % 41 == 0)
      (20L, Array(0.1f, 0.9f), 3),
      (21L, Array(0.2f, 1.8f), 3))      // same DIRECTION as... distinct
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(rows, stride = 41L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    // anchor 0: best different-label cosine is id 10 (cos 0.8 > 0.6 > 0.1/0.2-dir)
    assert(out(0L)._1 == 10L && out(0L)._2 == 1)
    // anchor 41 (along e2): ids 20 and 21 are NOT parallel; nearest is 21
    // (cos(e2, [0.2,1.8]) = 0.9939 > cos(e2, [0.1,0.9]) = 0.9939?) — use
    // the computed argmax instead of eyeballing: just assert label != 2
    assert(out(41L)._2 != 2, "negative must carry a different label")
    assert(out.size == 2, "one row per anchor")
  }

  test("hard negatives: exact tie on cosine breaks to the lowest negative id") {
    import spark.implicits._
    val rows = Seq(
      (0L,  Array(1f, 0f), 0),
      (30L, Array(0f, 2f), 1),
      (31L, Array(0f, 2f), 1))   // identical vector, identical cosine
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(rows, stride = 41L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 30L)
  }

  test("cosine profile: planted aligned/orthogonal/opposed pairs land in the right buckets") {
    import spark.implicits._
    // 6 vectors, offset pairing n/2=3: (0,3) identical -> cos 1 (bucket 10),
    // (1,4) orthogonal -> 0 (bucket 0), (2,5) opposed -> -1 (bucket -10)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 0), (4L, Array(0.0f, 1.0f), 0), (5L, Array(-1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.ext.Similarity.cosineProfile(vecs).collect()
    val r = rows
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("n_pairs")).toMap
    assert(r == Map(10L -> 1L, 0L -> 1L, -10L -> 1L))
    assert(rows.forall(_.getAs[Double]("pair_coverage") == 1.0))
  }

  test("cosine profile: sparse vec_ids surface as pair_coverage < 1, not a silent full-looking profile") {
    import spark.implicits._
    // ids 0..4 dense plus a gap at 10: off = 3, shifted ids 3,4 match,
    // 5,6,7,13 don't -> 2 of 3 expected pairs
    val vecs = Seq(0L, 1L, 2L, 3L, 4L, 10L)
      .map(id => (id, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.ext.Similarity.cosineProfile(vecs).collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == 2L)
    assert(rows.forall(r =>
      math.abs(r.getAs[Double]("pair_coverage") - 2.0 / 3.0) < 1e-12))
  }

  test("class balance: balanced k classes score exactly k; collapse scores toward 1") {
    import spark.implicits._
    def vecs(labels: Seq[Int]) = labels.zipWithIndex
      .map { case (l, i) => (i.toLong, Array(1.0f), l) }
      .toDF("vec_id", "embedding", "label")
    val bal = graft.ext.Similarity.classBalance(vecs(Seq(0, 0, 1, 1, 2, 2))).head()
    assert(bal.getAs[Long]("n_classes") == 3L)
    assert(bal.getAs[Double]("effective_classes") == 3.0)
    assert(bal.getAs[Double]("hhi") == 1.0 / 3.0)
    val skew = graft.ext.Similarity.classBalance(vecs(Seq(0, 0, 0, 0, 0, 1))).head()
    assert(skew.getAs[Double]("effective_classes") < 1.5)
    assert(skew.getAs[Double]("majority_share") == 5.0 / 6.0)
  }

  test("norm report: hand-computed norms, zero std for identical-norm class") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f), 1),  // norm 5
      (1L, Array(0.0f, 5.0f), 1),  // norm 5
      (2L, Array(6.0f, 8.0f), 2))  // norm 10
      .toDF("vec_id", "embedding", "label")
    val r = graft.ext.Similarity.normReport(vecs).collect()
      .map(x => x.getInt(0) -> ((x.getAs[Long]("n"),
        x.getAs[Double]("mean_norm"), x.getAs[Double]("std_norm")))).toMap
    assert(r(1) == ((2L, 5.0, 0.0)))
    assert(r(2)._2 == 10.0 && r(2)._3 == 0.0)
  }
}
