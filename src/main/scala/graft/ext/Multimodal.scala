package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.engine.{GraftSession, Tables}

/** Typed asset row for the [[Multimodal.typedDecode]] partition-decode
  * path (Dataset[T] with a case-class Encoder).
  */
final case class GraftAsset(asset_id: Long, payload: Array[Byte], kind: String, n_bytes: Int)

final case class GraftAssetFeatures(asset_id: Long, kind: String, features: Array[Double])

/** FAKE media codec — deterministic stand-in; see [[Multimodal.typedDecode]]. */
final class FakeCodec {
  private val crc = new java.util.zip.CRC32
  def decodeOne(payload: Array[Byte]): Array[Double] =
    Array.tabulate(8) { i =>
      crc.reset()
      crc.update(i)
      crc.update(payload, 0, payload.length)
      (crc.getValue % 1000L).toDouble / 1000.0
    }
}

/** Multimodal-column plumbing (north-star Tier B): opaque `binary`
  * payloads + typed metadata structs, with decode / feature-extract /
  * frame-sample stages.
  *
  * The real media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic fake
  * ([[fakeDecodeFeatures]]) — what is real and tested is the Spark-side
  * plumbing: the asset schema (binary + struct metadata), the batch
  * shape (row-local, codegen'd, no shuffle), partition-count
  * preservation, and the frame-sampling slice logic. Swapping the fake
  * for a real codec is a single expression replacement.
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(GraftSession.tuned(s), dir, n)

  /** Asset schema: id + opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("n_bytes", IntegerType),
      StructField("codec", StringType))))))

  /** Build an asset table from documents: payload = UTF-8 bytes of the
    * text (stand-in for image/audio bytes), metadata struct alongside.
    */
  def assets(docs: DataFrame): DataFrame = {
    // NULL text folds to an EMPTY payload here, once: every downstream
    // query (meta sizes, md5 features, frame slicing) then agrees with
    // its oracle on NULL rows instead of diverging on concat_ws-skips-
    // nulls vs string_agg-of-nulls semantics
    val txt = coalesce(col("text"), lit(""))
    docs.select(
      col("doc_id").as("asset_id"),
      encode(txt, "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("kind"),
        octet_length(txt).as("n_bytes"),
        lit("identity").as("codec")).as("meta"))
  }

  /** FAKE DECODE — deterministic stand-in for a real media decoder.
    * Derives an 8-dim feature vector from payload bytes via xxhash64.
    * Replace this expression with a real codec UDF when the media
    * libraries are available; the surrounding plumbing is unchanged.
    */
  def fakeDecodeFeatures(assets: DataFrame): DataFrame =
    assets.withColumn("features", expr(
      """transform(sequence(0, 7),
        |          i -> CAST(pmod(xxhash64(i, payload), 1000) AS DOUBLE) / 1000.0)""".stripMargin))

  /** Resize stage: downsample the payload to every k-th byte via the
    * native [[graft.functions.DownsampleExpr]] — the media-resize slot
    * in the decode → resize → feature pipeline (a real image resizer
    * swaps in for the sampling kernel; plumbing unchanged).
    */
  def resizeAssets(assetsDf: DataFrame, factor: Int): DataFrame =
    assetsDf.withColumn("payload_small", expr(s"graft_downsample(payload, $factor)"))

  /** Frame sampling: carve the payload into fixed-size "frames" and keep
    * every `stride`-th one — the batch shape of video frame extraction
    * (row-local explode; partitioning preserved).
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    assets.select(
      col("asset_id"),
      // the empty-payload guard matters: sequence(0, -1) in Spark steps
      // DOWNWARD to [0, -1], which would emit a spurious zero-byte frame
      expr(
        s"""posexplode(CASE WHEN meta.n_bytes <= 0 THEN CAST(array() AS ARRAY<BINARY>)
           |  ELSE filter(transform(sequence(0, CAST(ceil(meta.n_bytes / $frameBytes.0) AS INT) - 1),
           |    f -> CASE WHEN f % $stride = 0 THEN substring(payload, f * $frameBytes + 1, $frameBytes) END),
           |    x -> x IS NOT NULL) END""".stripMargin + ")").as(Seq("frame_idx", "frame")))

  /** Typed batch-decode plumbing: the Scala analog of a `mapInPandas`
    * decode stage. The partition iterator shape is the load-bearing part:
    * a REAL decoder initializes its codec once per partition (the
    * expensive step), then streams rows through it — exactly what this
    * does with a deterministic fake in place of the codec. Swapping in a
    * real media library changes only `decodeOne`.
    */
  def typedDecode(spark: SparkSession, assetsDf: DataFrame): Dataset[GraftAssetFeatures] = {
    import spark.implicits._
    assetsDf
      .select(
        col("asset_id"), col("payload"),
        col("meta.kind").as("kind"), col("meta.n_bytes").as("n_bytes"))
      .as[GraftAsset]
      .mapPartitions { rows =>
        // per-partition "codec" init happens HERE (once), not per row
        val codec = new FakeCodec
        rows.map(a => GraftAssetFeatures(a.asset_id, a.kind, codec.decodeOne(a.payload)))
      }
  }

  /** AUDIO family: interpret the payload as 16-bit big-endian PCM and
    * compute the two classic frame features — a loudness contour
    * (sum |amplitude| per window, the RMS slot in integer arithmetic)
    * and the zero-crossing count (the cheap pitch/noisiness proxy).
    * Window = 32 samples (64 bytes), hop = window (non-overlapping),
    * FULL windows only so every sample reads 2 complete bytes.
    *
    * Like the image path, the "decode" is byte-exact arithmetic both
    * engines repeat (hex → int, two's complement at 32768), not a real
    * audio codec — a real PCM decoder swaps into the same shape. All
    * row-local (explode + HOFs over plan-typed arrays): zero shuffle,
    * partitioning preserved, codegen throughout.
    */
  def pcmWindows(assetsDf: DataFrame, windowSamples: Int = 32): DataFrame = {
    val bytesPerWin = windowSamples * 2
    assetsDf
      // full windows only: sequence(0, n div bytes - 1) enumerates them;
      // the >= guard avoids Spark's downward-stepping sequence(0, -1)
      .where(col("meta.n_bytes") >= bytesPerWin)
      // hex PER WINDOW SLICE, not per asset: the r12 shape hex'd the
      // whole payload once and exploded window indexes beside it, but
      // GenerateExec copies the generator's REQUIRED CHILD OUTPUT into
      // every emitted row — a B-byte asset materialized (B/64)·2B hex
      // chars, O(B²) per asset (the md5Phash32 hex-hoist lesson, in
      // reverse: there the lambda re-evaluated hex per element; here
      // the explode re-CARRIED it per row). Slicing the payload first
      // makes each window row carry exactly its own 2·$bytesPerWin hex
      // chars: hex work stays O(B) per asset and the generate output
      // is window-sized. Byte-identical samples — hex is per-byte, so
      // hex(substring(payload, w·bpw + 1, bpw)) is precisely the
      // window's slice of hex(payload); the DuckDB oracle keeps the
      // shared-hex-string form (no BLOB substring there).
      .select(col("asset_id"),
        expr(
          s"""posexplode(transform(sequence(0, meta.n_bytes div $bytesPerWin - 1),
             |  w -> hex(substring(payload, w * $bytesPerWin + 1, $bytesPerWin))))"""
            .stripMargin).as(Seq("window_idx", "whx")))
      .select(col("asset_id"),
        col("window_idx"), // posexplode pos is already INT
        // samples materialized ONCE per window, in order, as a
        // plan-typed array<bigint>; both features fold over this array.
        // Parse: 2 bytes big-endian → unsigned via base-16 conv, then
        // two's complement at 32768 — byte-exact on both engines.
        expr(
          s"""transform(
             |  transform(sequence(0, $windowSamples - 1),
             |    si -> CAST(conv(substring(whx, si * 4 + 1, 4), 16, 10) AS BIGINT)),
             |  u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)""".stripMargin)
          .as("samples"))
  }

  /** Per-window audio features over [[pcmWindows]]: loudness (Σ|v|)
    * and zero crossings (adjacent sign products < 0 — a zero sample
    * never crosses, matching the usual strict definition).
    */
  def audioFeatures(assetsDf: DataFrame, windowSamples: Int = 32): DataFrame =
    pcmWindows(assetsDf, windowSamples)
      .select(col("asset_id"), col("window_idx"),
        expr("aggregate(samples, CAST(0 AS BIGINT), (acc, v) -> acc + abs(v))")
          .as("sum_abs"),
        expr(
          s"""size(filter(zip_with(slice(samples, 1, ${windowSamples - 1}),
             |                     slice(samples, 2, ${windowSamples - 1}),
             |                     (a, b) -> a * b < 0), x -> x))""".stripMargin)
          .cast("int").as("n_zero_cross"))

  // ---- registered queries ----------------------------------------------

  def metaQuery(s: SparkSession, dir: String): DataFrame =
    assets(t(s, dir, "documents"))
      .select(
        col("asset_id"),
        col("meta.kind").as("kind"),
        col("meta.n_bytes").as("n_bytes"),
        octet_length(col("payload")).as("payload_bytes"))
      .orderBy("asset_id")

  /** Registered feature-extraction query. Two constraints shape it: the
    * raw array<double> column is unsortable/unhashable in the driver's
    * pandas canonicalization (emit a CSV string), and an xxhash-based
    * fake can't be oracle-checked (DuckDB lacks xxhash64) — so THIS
    * query's fake decoder derives 8 hex features from md5 over the
    * decoded payload, which both engines compute identically. The
    * xxhash/CRC variants remain for the expression and typed paths.
    */
  def featuresQuery(s: SparkSession, dir: String): DataFrame =
    assets(t(s, dir, "documents"))
      .select(
        col("asset_id"), col("meta.kind").as("kind"),
        expr(
          """concat_ws(',', transform(sequence(0, 7),
            |  i -> substring(md5(concat(decode(payload, 'UTF-8'), '|', CAST(i AS STRING))), 1, 6)))""".stripMargin)
          .as("features_csv"))
      .orderBy("asset_id")

  def resizeQuery(s: SparkSession, dir: String): DataFrame =
    resizeAssets(assets(t(s, dir, "documents")), factor = 4)
      .select(
        col("asset_id"),
        octet_length(col("payload")).as("orig_bytes"),
        octet_length(col("payload_small")).as("small_bytes"))
      .orderBy("asset_id")

  def framesQuery(s: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(t(s, dir, "documents")), frameBytes = 64, stride = 2)
      .select(col("asset_id"), col("frame_idx"), octet_length(col("frame")).as("frame_bytes"))
      .orderBy("asset_id", "frame_idx")

  def audioQuery(s: SparkSession, dir: String): DataFrame =
    audioFeatures(assets(t(s, dir, "documents")))
      .orderBy("asset_id", "window_idx")

  /** 64-bit perceptual hash of a binary payload: SimHash over the
    * payload's byte-4-gram shingles (hex-string form, stride 2 — half the tokens, a flipped byte still changes ≤2 shingles) — a
    * LOCALITY-SENSITIVE signature in payload space (flip one byte and
    * only the ≤4 shingles covering it change their votes), which is
    * the pHash contract the way this container can honor it: a real
    * image pHash swaps the byte shingles for DCT coefficients of the
    * decoded bitmap; the signature→blocking→verify pipeline after that
    * expression is identical. Row-local and codegen'd (one hex + HOF
    * shingle build + the native graft_simhash64 vote loop).
    */
  def withPhash(assetsDf: DataFrame): DataFrame =
    assetsDf
      .where(col("meta.n_bytes") >= 4)
      .select(col("asset_id"),
        // one native loop over the raw bytes (graft_phash64) — the
        // hex+HOF formulation of the same signature measured ~4× slower
        expr("graft_phash64(payload)").as("phash"))

  /** Multimodal near-dup pairs: [[withPhash]] signatures through the
    * SAME pigeonhole chunk blocking + oversized-bucket cap + full-hash
    * Hamming verify as the text SimHash family (Dedup
    * .hammingBlockedPairs — exact recall within maxHamming, capped
    * candidate volume under degenerate payloads). XXH64 signatures are
    * engine-specific → rows-only key; the blocking is proven by the
    * oracle-green [[phashMd5Twin]].
    */
  def phashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.hammingBlockedPairs(
      withPhash(assets(t(s, dir, "documents"))),
      "asset_id", "phash", totalBits = 64, maxHamming = 3,
      // the (id, hash) relation feeds the census and both pair sides;
      // persisting it (~16 bytes/asset) avoids recomputing the per-byte
      // signature 3x — same rationale as the text simhash key
      maxBucket = 10000, cacheHashed = true)

  /** Engine-portable 32-bit perceptual hash (md5 votes over the same
    * byte shingles, via Dedup.md5Simhash32FromToks) for the oracle
    * twin. */
  def md5Phash32(assetsDf: DataFrame): DataFrame =
    Dedup.md5Simhash32FromToks(
      assetsDf
        .where(col("meta.n_bytes") >= 4)
        // hex(payload) HOISTED out of the shingle lambda: a lambda body
        // re-evaluates per element, so the inline form hexed the whole
        // payload once per shingle — O(n_bytes²) per asset (measured
        // 4.1 s → 0.9 s for the registered twin at sf0.1). Same
        // shingles, byte-for-byte.
        .select(col("asset_id"), expr("hex(payload)").as("__hx"),
          col("meta.n_bytes").as("__nb"))
        .select(col("asset_id"), explode(expr(
          """array_distinct(transform(
            |  sequence(0, __nb - 4, 2),
            |  i -> substring(__hx, i * 2 + 1, 8)))""".stripMargin))
          .as("tok")),
      "asset_id")

  /** md5-pHash blocking twin: pigeonhole-blocked pairs == DuckDB's
    * brute-force O(n²) Hamming scan over the WHOLE asset table. The
    * r6-era asset_id < 500 cap is gone: re-measured, the full oracle
    * is sub-second at every LOCAL CORRECTNESS SF (5000 assets at
    * sf0.1 → 12.5M Hamming comparisons), so the twin certifies the
    * blocking at the largest local SF too. Scope (r8 ADVICE): the
    * TWIN'S ORACLE is intentionally O(n²) and is only meant to run at
    * the correctness SFs — at replicated decade SFs (~250k assets at
    * sf5) it would be ~3e10 comparisons. The Spark side stays blocked
    * and decade-benchable; only the DuckDB mirror is gate-scoped, the
    * same split as the other brute-force mirrors (BASELINE.md r8).
    */
  def phashMd5Twin(s: SparkSession, dir: String): DataFrame =
    Dedup.hammingBlockedPairs(
      md5Phash32(assets(t(s, dir, "documents"))),
      "asset_id", "simhash32", totalBits = 32, maxHamming = 3,
      // cacheHashed for the same reason as [[phashPairs]]: the (id,
      // hash) relation (~16 bytes/asset) feeds the census and both
      // pair sides, and the md5-vote signature behind it is the
      // expensive per-byte-shingle pass — the twin was the one caller
      // recomputing it 3×
      maxBucket = Int.MaxValue, cacheHashed = true)

  /** Content-addressable storage dedup report: assets grouped by the
    * md5 digest of their binary payload, rolled into the one-row
    * savings summary a blob store publishes (copies beyond the first
    * are storable as references). Digest grouping shuffles 16-byte
    * keys once with map-side combine; the digest itself never leaves
    * the aggregate.
    */
  def payloadDedupStats(docs: DataFrame): DataFrame =
    assets(docs)
      .select(unhex(md5(col("payload"))).as("digest"),
        col("meta.n_bytes").cast("long").as("nb"))
      .groupBy("digest")
      .agg(count(lit(1)).as("copies"), max(col("nb")).as("nb"))
      .agg(sum(col("copies")).as("n_assets"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") - 1).as("n_dup_copies"),
        sum(col("copies") * col("nb")).as("bytes_total"),
        sum(col("nb")).as("bytes_unique"))
      .select(col("n_assets"), col("n_distinct"), col("n_dup_copies"),
        col("bytes_total"), col("bytes_unique"),
        (col("bytes_total") - col("bytes_unique")).as("bytes_saved"),
        (col("bytes_unique").cast("double") / col("bytes_total").cast("double"))
          .as("unique_fraction"))

  /** Magic-byte media-type sniffing — the trust-nothing ingest audit a
    * multimodal pipeline runs before routing payloads to decoders:
    * classify every binary payload by its LEADING BYTES (JPEG FFD8FF,
    * PNG 89504E47, GIF 'GIF', RIFF/WAV, %PDF-, ZIP PK\003\004; else
    * text) and cross-tabulate against the DECLARED kind, because
    * upstream metadata lies and a mislabeled payload crashes or — worse
    * — silently garbage-decodes. The fixture has no real media bytes,
    * so the registered query INJECTS deterministic magic prefixes
    * (doc_id % 7 picks the magic) and deliberately mislabels
    * (doc_id % 5 picks the declared kind over a different cycle) — the
    * sniffing expressions, the real artifact, see honest binary.
    *
    * 100 TB shape: pure row-local codegen — the sniff hexes only the
    * FIRST 5 payload bytes (never the payload body; the oracle hexes
    * the whole blob because DuckDB can't slice one, same first chars) —
    * followed by one bounded (declared × sniffed) census aggregate.
    */
  def sniffReport(docs: DataFrame): DataFrame = {
    val magics = Seq("FFD8FFE0", "89504E47", "47494638", "52494646",
      "255044462D", "504B0304", "")
    val kinds = Seq("image/jpeg", "image/png", "image/gif", "audio/wav",
      "application/pdf")
    val magic = magics.zipWithIndex.foldLeft(lit("")) { case (acc, (hexs, i)) =>
      when(pmod(col("doc_id"), lit(7)) === i, lit(hexs)).otherwise(acc)
    }
    val declared = kinds.zipWithIndex.foldLeft(lit("")) { case (acc, (kind, i)) =>
      when(pmod(col("doc_id"), lit(5)) === i, lit(kind)).otherwise(acc)
    }
    val pay = docs.select(
      concat(unhex(magic),
        encode(coalesce(col("text"), lit("")), "UTF-8")).as("payload"),
      declared.as("declared_kind"))
    val hexHead = hex(substring(col("payload"), 1, 5))
    val sniffed =
      when(substring(hexHead, 1, 6) === "FFD8FF", "image/jpeg")
        .when(substring(hexHead, 1, 8) === "89504E47", "image/png")
        .when(substring(hexHead, 1, 6) === "474946", "image/gif")
        .when(substring(hexHead, 1, 8) === "52494646", "audio/wav")
        .when(substring(hexHead, 1, 10) === "255044462D", "application/pdf")
        .when(substring(hexHead, 1, 8) === "504B0304", "application/zip")
        .otherwise("text/plain")
    pay
      .select(col("declared_kind"), sniffed.as("sniffed_kind"),
        octet_length(col("payload")).as("nb"))
      .groupBy("declared_kind", "sniffed_kind")
      .agg(count(lit(1)).as("n"), sum(col("nb").cast("long")).as("total_bytes"))
      .orderBy("declared_kind", "sniffed_kind")
  }

  /** Content-defined chunking (the Rabin/LBFS window-hash family;
    * Muthitacharoen et al. 2001): a chunk boundary opens at byte
    * position i iff the 4-byte window starting there hashes to
    * 0 mod `maskMod` — boundaries derive from CONTENT, so an insertion
    * shifts only the chunks it touches, which is why storage and
    * training-corpus dedup chunk this way instead of at fixed offsets
    * (a 1-byte prefix edit re-aligns every fixed block but only ONE
    * cdc chunk). Window hash = the engine-portable md5Uint32 recipe
    * over the window's hex form, so the WHOLE pipeline — boundary
    * rule, chunk spans, chunk digests — is DuckDB-mirrorable and the
    * gate checks it end to end (the phash-twin discipline). No
    * min/max chunk clamp: that variant (FastCDC normalization) gates
    * boundaries on the running chunk length, a sequential dependence
    * both engines would have to unroll; the plain window rule is the
    * published baseline and fully declarative.
    *
    * 100 TB shape: chunking is ONE row-local pass — the native
    * codegen'd [[graft.functions.CdcBoundariesExpr]] walks the raw
    * payload bytes once with a reused window buffer and a thread-local
    * MD5 (bit-identical to the declarative HOF/md5Uint32 recipe the
    * DuckDB oracle still runs, but without the per-position
    * substring/conv string churn that dominated the sf5 decade run —
    * this is the §2.11 escalation rule: builtin → codegen'd native
    * expression when the builtin formulation is the measured
    * bottleneck). No per-position explode, the payload string is never
    * duplicated; the census is one groupBy on 16-byte digests,
    * map-side combined.
    */
  def cdcChunks(docs: DataFrame, maskMod: Int = 64): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    docs
      .select(col("doc_id").as("asset_id"),
        hex(encode(txt, "UTF-8")).as("hx"),
        encode(txt, "UTF-8").as("bin"),
        octet_length(txt).as("n"))
      .where(col("n") >= 4)
      .withColumn("bpos", expr(s"graft_cdc_boundaries(bin, $maskMod)"))
      .select(col("asset_id"), col("hx"),
        posexplode(expr(
          """zip_with(concat(array(1), bpos), concat(bpos, array(n + 1)),
            |  (s, e) -> struct(s AS cs, e - s AS cl))""".stripMargin))
          .as(Seq("chunk_idx", "c")))
      .select(col("asset_id"), col("chunk_idx"),
        col("c.cs").as("c_start"), col("c.cl").as("c_len"),
        md5(expr("substring(hx, (c.cs - 1) * 2 + 1, c.cl * 2)"))
          .as("digest"))
  }

  /** Per-asset chunking report: how the content-defined boundaries cut
    * each payload.
    */
  def cdcChunkQuery(s: SparkSession, dir: String): DataFrame =
    cdcChunks(t(s, dir, "documents"))
      .orderBy("asset_id", "chunk_idx")

  /** Corpus-level chunk-dedup census — [[payloadDedupStats]] at CDC
    * chunk grain, where cross-document overlap that whole-payload
    * digests can never see (shared boilerplate, shifted copies)
    * becomes dedupable storage.
    */
  def cdcDedupStats(docs: DataFrame, maskMod: Int = 64): DataFrame =
    cdcChunks(docs, maskMod)
      // unhex: census on the 16-byte binary digest, not the 32-char
      // hex rendering cdcChunks exposes for its own oracle-compared
      // output; the digest never leaves this aggregate
      .groupBy(unhex(col("digest")).as("__d"))
      .agg(count(lit(1)).as("copies"), max(col("c_len")).as("cl"))
      .agg(sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("copies") - 1).as("n_dup_copies"),
        sum(col("copies") * col("cl")).cast("long").as("bytes_total"),
        sum(col("cl")).cast("long").as("bytes_unique"))
      .select(col("n_chunks"), col("n_distinct"), col("n_dup_copies"),
        col("bytes_total"), col("bytes_unique"),
        (col("bytes_total") - col("bytes_unique")).as("bytes_saved"),
        (col("bytes_unique").cast("double") / col("bytes_total").cast("double"))
          .as("unique_fraction"))

  /** Documents fixture with REAL image-format headers planted onto the
    * payload bytes: doc_id % 3 picks JPEG (SOI + the 16-byte JFIF APP0
    * + a VARIABLE-length COM segment the parser must walk over + SOF0
    * carrying the planted dims per ITU-T T.81), PNG (8-byte signature
    * + IHDR chunk per RFC 2083), or no header (raw text bytes). The
    * planted width/height derive from doc_id ALONE, so the oracle
    * re-derives ground truth independently of any byte parsing — a
    * walker bug (wrong segment skip, wrong offset, endian swap)
    * cannot agree with the gate by construction.
    */
  def plantedImageAssets(docs: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    val w = pmod(col("doc_id"), lit(1009)) + lit(16)
    val h = pmod(col("doc_id"), lit(997)) + lit(16)
    val comLen = pmod(col("doc_id"), lit(23)).cast("int")
    val jpegHex = concat(
      // SOI + JFIF APP0 (len 16)
      lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
        "0048" + "0048" + "0000"),
      // COM segment: variable-length comment the walker must skip
      lit("FFFE"), lpad(hex(comLen + lit(2)), 4, "0"),
      repeat(lit("58"), comLen),
      // SOF0 (len 17): precision 8, HEIGHT then WIDTH, 3 components
      lit("FFC0" + "0011" + "08"), lpad(hex(h), 4, "0"),
      lpad(hex(w), 4, "0"), lit("03" + "011100" + "021101" + "031101"))
    val pngHex = concat(
      // signature + IHDR length(13) + "IHDR" + WIDTH then HEIGHT
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      // bit depth 8, color type 6, compression/filter/interlace 0
      lit("0806000000"))
    val hdr = when(pmod(col("doc_id"), lit(3)) === 0, jpegHex)
      .when(pmod(col("doc_id"), lit(3)) === 1, pngHex)
      .otherwise(lit(""))
    docs.select(col("doc_id").as("asset_id"),
      concat(unhex(hdr), encode(txt, "UTF-8")).as("payload"))
  }

  /** Per-asset image dimensions via the native [[graft.functions
    * .ImageDimsExpr]] header parse — NULL dims for non-image payloads.
    * Row-local codegen; one scan, no shuffle.
    */
  def imageDimsQuery(s: SparkSession, dir: String): DataFrame =
    plantedImageAssets(t(s, dir, "documents"))
      .select(col("asset_id"), expr("graft_image_dims(payload)").as("dims"))
      .select(col("asset_id"),
        when(col("dims") >= 0, shiftright(col("dims"), 32).cast("int"))
          .as("width"),
        when(col("dims") >= 0,
          col("dims").bitwiseAND(lit(0xffffffffL)).cast("int"))
          .as("height"))
      .orderBy("asset_id")

  /** Per-doc duplicated-CDC-chunk byte stats — the scoring core of the
    * [[TrainingPipeline]] chunk-dedup stage, registered standalone so
    * the stage's semantics are oracle-gated, not just spec-covered: a
    * chunk digest's first occurrence (min asset_id) is canonical, and
    * a doc's `dup_frac` is the fraction of its bytes living in chunks
    * first seen in an EARLIER doc (shifted copies, shared boilerplate).
    *
    * 100 TB shape: one row-local codegen'd chunking pass, then
    * AGGREGATES only — ownership was a `min() OVER (PARTITION BY
    * digest)` window through r9, which never map-side combines: a
    * boilerplate chunk shared by 10⁸ docs would funnel every
    * occurrence into ONE task (the r9 verdict's scale-killer; the
    * repo's own spanDedupApply names the same trap). Now a
    * (digest, asset_id) pre-aggregate collapses within-doc repeats
    * with map-side combine, owners come from a second combined
    * aggregate over THAT (≤ one row per digest per doc), and the
    * join-back is an SMJ on the digest with AQE skew-split; the
    * pre-aggregate's exchange feeds both the owner agg and the probe,
    * so ReuseExchange computes the chunking pass once. Nothing
    * corpus-scale broadcast. Docs under the 4-byte chunking floor
    * produce no chunks and are absent (the pipeline keeps them).
    */
  def chunkDupStats(docs: DataFrame, maskMod: Int = 64): DataFrame = {
    val perDoc = cdcChunks(docs, maskMod)
      // unhex: every downstream shuffle/join keys on the 16-byte
      // binary digest (cdcChunks exposes hex only for its own
      // oracle-compared output)
      .groupBy(unhex(col("digest")).as("__d"), col("asset_id"))
      .agg(sum(col("c_len").cast("long")).as("__bytes"))
    val owners = perDoc
      .groupBy(col("__d"))
      .agg(min(col("asset_id")).as("__owner"))
    perDoc
      .join(owners.hint("merge"), Seq("__d"))
      .groupBy(col("asset_id").as("doc_id"))
      .agg(sum(when(col("__owner") < col("asset_id"), col("__bytes"))
        .otherwise(lit(0L))).as("dup_bytes"),
        sum(col("__bytes")).as("total_bytes"))
      .select(col("doc_id"), col("dup_bytes"), col("total_bytes"),
        (col("dup_bytes").cast("double") / col("total_bytes").cast("double"))
          .as("dup_frac"))
  }

  /** Shared oracle prefix: chunk relation in DuckDB (mirrors
    * [[cdcChunks]] — same boundary rule, spans, digests).
    */
  private val cdcChunkSql: String =
    """WITH a AS (
      |  SELECT doc_id AS asset_id, hex(encode(coalesce(text, ''))) AS hx,
      |         octet_length(encode(coalesce(text, ''))) AS n
      |  FROM documents
      |  WHERE octet_length(encode(coalesce(text, ''))) >= 4),
      |b AS (
      |  SELECT asset_id, hx, n,
      |         CASE WHEN n - 3 >= 2 THEN
      |           list_filter(list_transform(range(2, n - 2),
      |             i -> CASE WHEN ('0x' || substring(md5(substring(hx,
      |                    CAST((i - 1) * 2 + 1 AS INT), 8)), 25, 8))::BIGINT
      |                    % 64 = 0 THEN CAST(i AS INT) END),
      |             x -> x IS NOT NULL)
      |         ELSE [] END AS bpos
      |  FROM a),
      |c AS (
      |  SELECT asset_id, hx,
      |         list_prepend(CAST(1 AS INT), bpos) AS starts,
      |         list_append(bpos, CAST(n + 1 AS INT)) AS ends
      |  FROM b),
      |ch AS (
      |  SELECT asset_id, CAST(t.i - 1 AS INT) AS chunk_idx,
      |         starts[CAST(t.i AS INT)] AS c_start,
      |         ends[CAST(t.i AS INT)] - starts[CAST(t.i AS INT)] AS c_len,
      |         md5(substring(hx,
      |           CAST((starts[CAST(t.i AS INT)] - 1) * 2 + 1 AS INT),
      |           CAST((ends[CAST(t.i AS INT)] - starts[CAST(t.i AS INT)]) * 2 AS INT))) AS digest
      |  FROM c, unnest(range(1, len(starts) + 1)) AS t(i))""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_content_chunks",
      "content-defined chunking (window-hash Rabin-style, md5 recipe): per-asset chunk spans + digests",
      cdcChunkQuery,
      Some(cdcChunkSql +
        "\nSELECT asset_id, chunk_idx, c_start, c_len, digest FROM ch" +
        "\nORDER BY asset_id, chunk_idx")),
    GraftQuery("q_chunk_dup_docs",
      "per-doc duplicated-CDC-chunk byte fraction (first occurrence = min asset_id owns a digest) — the TrainingPipeline chunk-dedup stage's scoring core",
      (s, dir) => chunkDupStats(t(s, dir, "documents")).orderBy("doc_id"),
      Some(cdcChunkSql + """,
        |own AS (SELECT digest, min(asset_id) AS owner FROM ch GROUP BY 1),
        |pd AS (
        |  SELECT ch.asset_id AS doc_id,
        |         CAST(sum(CASE WHEN own.owner < ch.asset_id
        |                       THEN ch.c_len ELSE 0 END) AS BIGINT) AS dup_bytes,
        |         CAST(sum(ch.c_len) AS BIGINT) AS total_bytes
        |  FROM ch JOIN own USING (digest) GROUP BY 1)
        |SELECT doc_id, dup_bytes, total_bytes,
        |       CAST(dup_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE) AS dup_frac
        |FROM pd ORDER BY doc_id""".stripMargin)),
    GraftQuery("q_chunk_dedup",
      "chunk-grain dedup census over content-defined chunks: copies, unique bytes, savings",
      (s, dir) => cdcDedupStats(t(s, dir, "documents")),
      Some(cdcChunkSql + """,
        |g AS (SELECT digest, count(*) AS copies, max(c_len) AS cl
        |      FROM ch GROUP BY 1)
        |SELECT CAST(sum(copies) AS BIGINT) AS n_chunks,
        |       count(*) AS n_distinct,
        |       CAST(sum(copies - 1) AS BIGINT) AS n_dup_copies,
        |       CAST(sum(copies * cl) AS BIGINT) AS bytes_total,
        |       CAST(sum(cl) AS BIGINT) AS bytes_unique,
        |       CAST(sum(copies * cl) - sum(cl) AS BIGINT) AS bytes_saved,
        |       CAST(CAST(sum(cl) AS BIGINT) AS DOUBLE) /
        |         CAST(CAST(sum(copies * cl) AS BIGINT) AS DOUBLE) AS unique_fraction
        |FROM g ORDER BY n_chunks""".stripMargin)),
    GraftQuery("q_image_dims",
      "JPEG SOF marker-walk + PNG IHDR dimension parse over planted real-format headers (native codegen expression; doc_id-derived oracle)",
      imageDimsQuery,
      Some(
        """SELECT doc_id AS asset_id,
          |       CASE WHEN doc_id % 3 IN (0, 1)
          |            THEN CAST(doc_id % 1009 + 16 AS INT) END AS width,
          |       CASE WHEN doc_id % 3 IN (0, 1)
          |            THEN CAST(doc_id % 997 + 16 AS INT) END AS height
          |FROM documents ORDER BY asset_id""".stripMargin)),
    GraftQuery("q_media_sniff",
      "magic-byte media-type sniff vs declared kind: the metadata-lies ingest audit (injected deterministic magics)",
      (s, dir) => sniffReport(t(s, dir, "documents")),
      Some(
        """WITH inj AS (
          |  SELECT doc_id,
          |    CASE doc_id % 7 WHEN 0 THEN 'FFD8FFE0' WHEN 1 THEN '89504E47'
          |      WHEN 2 THEN '47494638' WHEN 3 THEN '52494646'
          |      WHEN 4 THEN '255044462D' WHEN 5 THEN '504B0304' ELSE '' END AS magic,
          |    CASE doc_id % 5 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png'
          |      WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
          |      ELSE 'application/pdf' END AS declared_kind,
          |    COALESCE(text, '') AS txt
          |  FROM documents),
          |pay AS (
          |  SELECT declared_kind, unhex(magic) || encode(txt) AS payload
          |  FROM inj),
          |sn AS (
          |  SELECT declared_kind, CAST(octet_length(payload) AS INTEGER) AS nb,
          |    CASE WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
          |         WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image/png'
          |         WHEN substring(hex(payload), 1, 6) = '474946' THEN 'image/gif'
          |         WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'audio/wav'
          |         WHEN substring(hex(payload), 1, 10) = '255044462D' THEN 'application/pdf'
          |         WHEN substring(hex(payload), 1, 8) = '504B0304' THEN 'application/zip'
          |         ELSE 'text/plain' END AS sniffed_kind
          |  FROM pay)
          |SELECT declared_kind, sniffed_kind, count(*) AS n,
          |       CAST(sum(nb) AS BIGINT) AS total_bytes
          |FROM sn GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    GraftQuery("q_payload_dedup",
      "content-addressable dedup report: md5 payload digests, copy counts, exact bytes-saved accounting",
      (s, dir) => payloadDedupStats(t(s, dir, "documents")),
      Some(
        """WITH a AS (
          |  SELECT md5(coalesce(text, '')) AS digest,
          |         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS nb
          |  FROM documents),
          |g AS (SELECT digest, count(*) AS copies, max(nb) AS nb FROM a GROUP BY 1),
          |r AS (SELECT CAST(sum(copies) AS BIGINT) AS n_assets, count(*) AS n_distinct,
          |        CAST(sum(copies - 1) AS BIGINT) AS n_dup_copies,
          |        CAST(sum(copies * nb) AS BIGINT) AS bytes_total,
          |        CAST(sum(nb) AS BIGINT) AS bytes_unique
          |      FROM g)
          |SELECT n_assets, n_distinct, n_dup_copies, bytes_total, bytes_unique,
          |       bytes_total - bytes_unique AS bytes_saved,
          |       CAST(bytes_unique AS DOUBLE) / CAST(bytes_total AS DOUBLE) AS unique_fraction
          |FROM r ORDER BY n_assets""".stripMargin)),
    GraftQuery("q_phash_neardup",
      "multimodal perceptual-hash near-dup pairs (byte-shingle SimHash, chunk-blocked; XXH64 -> rows-only; blocking proven by q_phash_md5_twin)",
      phashPairs, None),
    GraftQuery("q_phash_md5_twin",
      "md5-pHash pigeonhole blocking == brute-force O(n^2) Hamming scan over payload byte shingles",
      phashMd5Twin,
      Some(
        """WITH a AS (
          |  SELECT doc_id AS asset_id, hex(encode(coalesce(text, ''))) AS hx,
          |         octet_length(encode(coalesce(text, ''))) AS n
          |  FROM documents
          |  WHERE octet_length(encode(coalesce(text, ''))) >= 4),
          |tk AS (
          |  SELECT DISTINCT asset_id, substring(hx, CAST(t.i * 2 + 1 AS INT), 8) AS tok
          |  FROM a, unnest(range(0, n - 3, 2)) AS t(i)),
          |th AS (
          |  SELECT asset_id, ('0x' || substring(md5(tok), 25, 8))::BIGINT AS h FROM tk),
          |votes AS (
          |  SELECT asset_id, b,
          |         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          |  FROM th CROSS JOIN (SELECT unnest(range(32)) AS b) bits
          |  GROUP BY asset_id, b),
          |ph AS (
          |  SELECT asset_id,
          |         CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash32
          |  FROM votes GROUP BY asset_id)
          |SELECT a.asset_id AS id1, b.asset_id AS id2,
          |       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS INTEGER) AS hamming
          |FROM ph a JOIN ph b ON a.asset_id < b.asset_id
          |WHERE bit_count(xor(a.simhash32, b.simhash32)) <= 3
          |ORDER BY id1, id2""".stripMargin)),
    GraftQuery("q_multimodal_meta", "binary payload + struct metadata projection",
      metaQuery,
      Some(
        """SELECT doc_id AS asset_id, 'text/plain' AS kind,
          |       CAST(octet_length(encode(coalesce(text, ''))) AS INTEGER) AS n_bytes,
          |       CAST(octet_length(encode(coalesce(text, ''))) AS INTEGER) AS payload_bytes
          |FROM documents ORDER BY asset_id""".stripMargin)),
    GraftQuery("q_multimodal_features", "fake-decode feature extraction over binary payloads",
      featuresQuery,
      Some(
        """SELECT doc_id AS asset_id, 'text/plain' AS kind,
          |       list_aggregate(list_transform(range(0, 8),
          |         i -> substring(md5(coalesce(text, '') || '|' || i), 1, 6)), 'string_agg', ',') AS features_csv
          |FROM documents ORDER BY asset_id""".stripMargin)),
    GraftQuery("q_multimodal_resize", "payload downsample (resize-kernel slot)",
      resizeQuery,
      Some(
        """SELECT doc_id AS asset_id,
          |       CAST(octet_length(encode(coalesce(text, ''))) AS INTEGER) AS orig_bytes,
          |       CAST(ceil(octet_length(encode(coalesce(text, ''))) / 4.0) AS INTEGER) AS small_bytes
          |FROM documents ORDER BY asset_id""".stripMargin)),
    GraftQuery("q_multimodal_frames", "frame-sampling slices of binary payloads",
      framesQuery,
      // frame lengths are pure arithmetic over the payload size, so the
      // oracle never touches blob slicing: kept frames are f = 0,2,4,...
      // and the last frame is the remainder
      Some(
        """WITH fr AS (
          |  SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS n,
          |         unnest(range(0, CAST(ceil(octet_length(encode(coalesce(text, ''))) / 64.0) AS BIGINT), 2)) AS f
          |  FROM documents)
          |SELECT doc_id AS asset_id, CAST(f // 2 AS INT) AS frame_idx,
          |       CAST(least(64, n - f * 64) AS INT) AS frame_bytes
          |FROM fr ORDER BY asset_id, frame_idx""".stripMargin)),
    GraftQuery("q_audio_pcm_stats",
      "PCM window features over binary payloads: loudness contour + zero-crossing count (16-bit big-endian, full 32-sample windows)",
      audioQuery,
      Some(
        """WITH a AS (
          |  SELECT doc_id AS asset_id, hex(encode(coalesce(text, ''))) AS hx,
          |         octet_length(encode(coalesce(text, ''))) AS n
          |  FROM documents),
          |w AS (
          |  SELECT asset_id, hx, unnest(range(0, n // 64)) AS window_idx
          |  FROM a WHERE n >= 64),
          |s AS (
          |  SELECT asset_id, CAST(window_idx AS INT) AS window_idx,
          |         list_transform(
          |           list_transform(range(0, 32),
          |             si -> ('0x' || substring(hx, CAST((window_idx * 64 + si * 2) * 2 + 1 AS BIGINT), 4))::BIGINT),
          |           u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS samples
          |  FROM w)
          |SELECT asset_id, window_idx,
          |       CAST(list_sum(list_transform(samples, v -> abs(v))) AS BIGINT) AS sum_abs,
          |       CAST(len(list_filter(list_transform(range(1, 32),
          |                 i -> samples[CAST(i AS INT)] * samples[CAST(i + 1 AS INT)] < 0),
          |               x -> x)) AS INT) AS n_zero_cross
          |FROM s ORDER BY asset_id, window_idx""".stripMargin)),
  )
}
