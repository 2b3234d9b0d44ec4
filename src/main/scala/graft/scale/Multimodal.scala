package graft.scale

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque BINARY payloads plus a
  * typed metadata struct, with decode / feature-extract / resize /
  * frame-sample stages (north-star requirement; the reference is text-only).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * [[StubCodec]] derives deterministic fake pixels/samples from the md5 of
  * the payload bytes. Everything around it is real and tested: the schema,
  * the per-partition batched execution (`mapPartitions` — the Scala analog of
  * arrow-batched python UDFs: one codec instance per partition, not per row),
  * the size-balanced repartitioning, and the feature post-processing, which
  * is plain columnar Spark.
  *
  * Scale design: media blobs are large and skewed, so [[repartitionBySize]]
  * range-partitions on cumulative byte size before the decode stage — a 1000-
  * executor cluster then decodes balanced byte volumes, not balanced row
  * counts. Decoded features are small fixed-width arrays; everything
  * downstream is normal columnar work.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** Fabricate a multimodal table from the documents corpus: payload =
    * utf-8 bytes of the text (a stand-in blob; real pipelines read files via
    * `spark.read.format("binaryFile")`), metadata derived deterministically
    * from the doc key.
    */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3 + 1).cast("int")).as("kind"),
        (col(idCol) % 640 + 16).cast("int").as("width"),
        (col(idCol) % 480 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col(idCol) % 30 + 1).cast("int").as("n_frames")).as("meta"))

  /** Byte-volume-balanced repartitioning: bin rows by the running total of
    * payload bytes (parallel global cumsum) so each partition decodes a
    * comparable byte VOLUME. Row-count balance — or range-partitioning on
    * the size itself, which concentrates the biggest blobs together — is
    * the wrong target for skewed blob sizes.
    */
  def repartitionBySize(df: DataFrame, numPartitions: Int,
      payloadCol: String = "payload",
      orderCol: String = "doc_id"): DataFrame = {
    val sized = df.withColumn("__sz",
      coalesce(length(col(payloadCol)).cast("long"), lit(0L)))
    val total = math.max(
      sized.agg(sum(col("__sz"))).first().getLong(0), 1L)
    val perBin = math.max(total / numPartitions, 1L)
    graft.sample.Samplers.globalCumSum(sized, Seq(orderCol), "__sz")
      .withColumn("__bin",
        least(floor((col("__cum") - col("__sz")) / perBin),
          lit(numPartitions - 1L)))
      .repartition(numPartitions, col("__bin"))
      .drop("__sz", "__cum", "__bin")
  }

  /** The stubbed codec: deterministic fake decode. A real deployment swaps
    * this object for JNI/javacpp bindings (libjpeg/ffmpeg) — the pipeline
    * shape does not change.
    */
  object StubCodec {
    /** md5 of the payload — the seed all fake signals derive from. */
    def digest(payload: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(payload)

    /** STUB — not a real image decode. Fake `n` channel statistics: byte i of
      * md5(payload), unsigned. Deterministic, reproducible in any engine
      * that has md5.
      */
    def channelStats(payload: Array[Byte], n: Int): Array[Int] =
      digest(payload).take(n).map(b => b & 0xff)

    /** STUB — fake per-frame signature for video: md5 over (payload ++ frame
      * index as a decimal string — string, not raw byte, so the DuckDB
      * oracle can replay it with VARCHAR md5), first byte unsigned.
      */
    def frameSignature(payload: Array[Byte], frame: Int): Int = {
      val md = MessageDigest.getInstance("MD5")
      md.update(payload)
      md.update(frame.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest()(0) & 0xff
    }

    /** STUB grid — now only the NON-IMAGE fallback branch of
      * [[Codec.gridOrStub]] (real payloads decode for real:
      * [[Codec.decodeGray]] + [[Codec.grayGrid8]]): payload → 8×8
      * grayscale grid (64 unsigned bytes) as four chained md5 digests
      * md5(payload ++ ":0" … ":3"). Deterministic fake pixels keep the
      * text-corpus pHash queries oracle-replayable — the ":chunk" suffix
      * is a decimal string so DuckDB replays the grid with VARCHAR md5
      * over the text payload. Everything DOWNSTREAM of the grid (the DCT
      * perceptual hash) is the real algorithm in both branches.
      */
    /** STUB waveform — the NON-WAV fallback branch of
      * [[Codec.samplesOrStub]] (real RIFF/PCM payloads decode for real:
      * [[Codec.decodePcmWav]]): payload → 256 centered samples in
      * [-128, 127] as sixteen chained md5 digests md5(payload ++ ":a0"
      * … ":a15"), each byte minus 128. The ":a<chunk>" suffix is a
      * decimal string (the grayGrid convention) so the DuckDB oracle
      * replays the waveform with VARCHAR md5 over the text payload.
      * Everything DOWNSTREAM (RMS / zero-crossings / silence) is the
      * real algorithm in both branches.
      */
    def audioSamples(payload: Array[Byte]): Array[Int] = {
      val out = new Array[Int](256)
      var chunk = 0
      while (chunk < 16) {
        val md = MessageDigest.getInstance("MD5")
        md.update(payload)
        md.update((":a" + chunk)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val dg = md.digest()
        var i = 0
        while (i < 16) { out(chunk * 16 + i) = (dg(i) & 0xff) - 128; i += 1 }
        chunk += 1
      }
      out
    }

    def grayGrid(payload: Array[Byte]): Array[Int] = {
      val out = new Array[Int](64)
      var chunk = 0
      while (chunk < 4) {
        val md = MessageDigest.getInstance("MD5")
        md.update(payload)
        md.update((":" + chunk)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val dg = md.digest()
        var i = 0
        while (i < 16) { out(chunk * 16 + i) = dg(i) & 0xff; i += 1 }
        chunk += 1
      }
      out
    }
  }

  /** Quantized 8-point DCT-II cosine table: cosQ(u·8 + r) =
    * round(cos((2r+1)·u·π/16) · 1024). StrictMath (fdlibm) keeps the table
    * bit-identical on every JVM; the integers are interpolated verbatim
    * into the DuckDB oracle, so both engines multiply the SAME table.
    */
  private[graft] val cosQ: Array[Int] = {
    val t = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var r = 0
      while (r < 8) {
        t(u * 8 + r) = math.round(
          StrictMath.cos((2 * r + 1) * u * math.Pi / 16.0) * 1024.0).toInt
        r += 1
      }
      u += 1
    }
    t
  }

  /** REAL perceptual hash over a decoded 8×8 grid — the pHash construction
    * (DCT + median threshold), exact-integer so any engine replays it:
    * 2D DCT-II coefficients C(u,v) = Σ p(r,c)·cosQ(u,r)·cosQ(v,c) (exact
    * Longs: ≤ 64·255·1024² ≈ 1.7e10), the 60 AC coefficients in row-major
    * (u,v) order j = 1..60 (skipping DC, which only encodes brightness),
    * thresholded at their LOWER MEDIAN (30th smallest — deterministic on
    * ties): bit i = [C_{i+1} > median]. Near-identical grids move each
    * coefficient by O(perturbation·1024²) ≪ typical coefficient spread, so
    * few bits flip — unlike a cryptographic hash, Hamming distance tracks
    * visual distance, which is what makes the multi-band LSH a NEAR-dup
    * finder rather than an exact-dup finder.
    */
  def dctPhash(grid: Array[Int]): Long = {
    require(grid.length == 64, s"need an 8x8 grid, got ${grid.length}")
    val c = new Array[Long](61)
    var j = 1
    while (j <= 60) {
      val u = j / 8
      val v = j % 8
      var s = 0L
      var k = 0
      while (k < 64) {
        s += grid(k).toLong * cosQ(u * 8 + k / 8) * cosQ(v * 8 + k % 8)
        k += 1
      }
      c(j) = s
      j += 1
    }
    val sorted = java.util.Arrays.copyOfRange(c, 1, 61)
    java.util.Arrays.sort(sorted)
    val med = sorted(29)
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (c(i + 1) > med) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Decode + feature-extract stage: per partition, one codec instance, rows
    * streamed through it (the batched-UDF shape). Output schema: id, kind,
    * n_bytes, fixed-width feature array.
    */
  def decodeFeatures(df: DataFrame, idCol: String = "doc_id",
      nChannels: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("features", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("payload"), col("meta.kind").as("kind"))
      .mapPartitions { rows =>
        // per-partition codec init happens here (stub has none)
        rows.map { r =>
          // null payload → zero-byte blob, not an executor NPE
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getLong(0), r.getString(2), payload.length,
            StubCodec.channelStats(payload, nChannels).toSeq)
        }
      }(enc)
  }

  /** Audio statistics over the codec seam — per audio row: sample count,
    * peak amplitude, zero-crossing count (the classic voiced/unvoiced /
    * noise discriminator), RMS level and silence fraction — the
    * screening panel an audio-corpus curation pass runs before paying
    * for transcription (drop silent/clipped/degenerate clips first).
    *
    * REAL decode path: RIFF/PCM16 payloads parse for real
    * ([[Codec.decodePcmWav]], incl. truncating-mean stereo downmix);
    * everything else flows through the md5 stub waveform
    * ([[StubCodec.audioSamples]]) so text-corpus queries stay
    * oracle-replayable. The mapPartitions stage emits EXACT INTEGERS
    * only (n, peak, crossings, Σs², silent count); the two floats (RMS,
    * silence fraction) are Catalyst expressions on those integers,
    * mirrored by the oracle (IEEE sqrt/div are correctly rounded — both
    * engines agree bit-for-bit).
    *
    * Scale shape: one decode pass (the [[decodeFeatures]] contract —
    * pair with [[repartitionBySize]] for skewed blob sizes), no shuffle
    * at all: the stats are per-row.
    */
  def audioStats(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("zero_crossings", IntegerType, nullable = false),
      StructField("__sumsq", LongType, nullable = false),
      StructField("__n_silent", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.filter(col("meta.kind") === "audio")
      .select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val s = Codec.samplesOrStub(payload)
          var peak = 0
          var zc = 0
          var silent = 0
          var sumsq = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            val a = math.abs(v)
            if (a > peak) peak = a
            if (a <= 4) silent += 1
            sumsq += v.toLong * v
            if (i + 1 < s.length && v.toLong * s(i + 1) < 0) zc += 1
            i += 1
          }
          Row(r.getLong(0), s.length, peak, zc, sumsq, silent)
        }
      }(enc)
      .select(col(idCol), col("n_samples"), col("peak"),
        col("zero_crossings"),
        when(col("n_samples") > 0,
          round(sqrt(col("__sumsq").cast("double") /
            col("n_samples").cast("double")), 6)).as("rms"),
        when(col("n_samples") > 0,
          round(col("__n_silent").cast("double") /
            col("n_samples").cast("double"), 6)).as("silence_frac"))
  }

  /** Audio near-dup fingerprint — the energy-delta-sign signature (the
    * Haitsma-Kalker / Shazam-family construction, reduced to one band):
    * the first 256 seam samples frame into 32 windows of 8, each window's
    * energy Σs² is an exact long, and bit f = [e_{f+1} > e_f] — 31 bits
    * of LOUDNESS SHAPE, invariant to level scaling and robust to small
    * perturbations (a near-copy moves each energy a little; a bit only
    * flips where adjacent energies nearly tie). Zero-padded past the
    * clip's end; signatures are corpus-row-scale whatever the blob sizes.
    *
    * Pairing reuses the pHash multi-band machinery
    * ([[bandedHammingPairs]], 32-bit sigs → 4×8-bit bands, complete for
    * hamming ≤ 3 by pigeonhole, exact bit_count verify) — candidate mass
    * stays linear, never all-pairs.
    */
  def audioFingerprint(media: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val sigSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(sigSchema)
    media.filter(col("meta.kind") === "audio")
      .select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val s = Codec.samplesOrStub(payload)
          val e = new Array[Long](32)
          var f = 0
          while (f < 32) {
            var acc = 0L
            var i = 0
            while (i < 8) {
              val k = f * 8 + i
              val v = if (k < s.length) s(k).toLong else 0L
              acc += v * v
              i += 1
            }
            e(f) = acc
            f += 1
          }
          var sig = 0L
          var b = 0
          while (b < 31) {
            if (e(b + 1) > e(b)) sig |= 1L << b
            b += 1
          }
          Row(r.getLong(0), sig)
        }
      }(enc)
  }

  /** Audio near-dup pairs over [[audioFingerprint]] signatures — banded
    * Hamming join, complete for `maxHamming < bands`.
    */
  def audioDupPairs(media: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    bandedHammingPairs(audioFingerprint(media, idCol), idCol, 32,
      maxHamming, bands)

  /** Shot-boundary detection over the video frame-signature sequence —
    * the screening pass a video-corpus curation step runs before paying
    * for per-shot embedding: a boundary is a frame whose signature jumps
    * more than `threshold` from its predecessor (the classic
    * frame-difference detector; the SIGNATURE is the codec seam — the
    * md5 stub here, a real frame histogram/embedding in deployment —
    * while the thresholded-delta algebra downstream is the real
    * algorithm). Shots = boundaries + 1.
    *
    * Scale shape: one decode pass, per-row state bounded by n_frames —
    * no shuffle, no frame explosion (the per-frame relation never
    * materializes; [[sampleFrames]] is the op that wants frames as rows).
    */
  def shotBoundaries(media: DataFrame, idCol: String = "doc_id",
      threshold: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("n_shots", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("meta.kind") === "video")
      .select(col(idCol), col("payload"),
        col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val n = r.getInt(2)
          var prev = -1
          var bounds = 0
          var f = 0
          while (f < n) {
            val sig = StubCodec.frameSignature(payload, f)
            if (f > 0 && math.abs(sig - prev) > threshold) bounds += 1
            prev = sig
            f += 1
          }
          Row(r.getLong(0), n, if (n == 0) 0 else bounds + 1)
        }
      }(enc)
  }

  /** Frame sampling for video rows: emit every `stride`-th frame index with
    * its (stubbed) signature. Row-multiplying stage — explode on a bounded
    * per-row frame count, so output scales with Σ n_frames/stride.
    */
  def sampleFrames(df: DataFrame, idCol: String = "doc_id",
      stride: Int = 5): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame", IntegerType, nullable = false),
      StructField("signature", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.filter(col("meta.kind") === "video")
      .select(col(idCol), col("payload"), col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          (0 until r.getInt(2) by stride).iterator.map { f =>
            Row(r.getLong(0), f, StubCodec.frameSignature(payload, f))
          }
        }
      }(enc)
  }

  /** "Resize" stage (STUB): recompute channel stats at a coarser feature
    * width — stands in for image resize changing the feature dimensionality.
    * Pure column work over already-decoded features: truncate the array.
    */
  def resizeFeatures(decoded: DataFrame, newWidth: Int): DataFrame =
    decoded.withColumn("features", slice(col("features"), 1, newWidth))

  /** Media near-dup pairs by perceptual-signature LSH — the image-dedup
    * shape of a LAION-style corpus clean. The signature is a REAL DCT
    * pHash ([[dctPhash]]: integer 8×8 DCT-II + median threshold) over the
    * decoded grid, and the decode itself is now real for recognized
    * image payloads ([[Codec.decodeGray]]: PPM/PGM parsed pure-JVM,
    * PNG/BMP/GIF via javax.imageio, box-filtered to 8×8); unrecognized
    * payloads (e.g. the text corpora the oracle queries run on) fall back
    * to [[StubCodec.grayGrid]]'s md5 grid, which keeps those queries
    * deterministic and DuckDB-replayable. The pipeline is the real
    * algorithm end-to-end: split the 60-bit signature into `bands` disjoint
    * bit-bands and bucket-join on (band, band bits) — by pigeonhole,
    * EVERY pair within Hamming distance < `bands` shares at least one
    * exact band, so candidate generation is complete for `maxHamming ≤
    * bands - 1` and stays linear in corpus size (a pair never forms
    * unless it collides on 15 exact bits); then one codegen'd
    * `bit_count(xor)` verifies the true distance. Multi-band is strictly
    * stronger than [[Dedup.simhashPairs]]'s single top-bit block (which
    * misses near-dups differing in the prefix) — kept separate because the
    * text simhash documents that tradeoff deliberately.
    */
  def phashPairs(media: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val sigSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sig", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(sigSchema)
    // decode + hash per partition (the batched-UDF shape, like
    // decodeFeatures): one pass over payload bytes, 8-byte sig out —
    // signature mass is corpus-row-scale regardless of blob sizes
    val sigs = media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getLong(0), dctPhash(Codec.gridOrStub(payload)))
        }
      }(enc)
    phashPairsFromSigs(sigs, idCol, maxHamming, bands)
  }

  /** The banding + verify core over precomputed (id, 60-bit sig) rows —
    * separated so the completeness property (every pair with hamming <
    * bands survives) is testable with PLANTED signatures, which a real
    * hash function cannot produce on demand.
    */
  def phashPairsFromSigs(sigs: DataFrame, idCol: String,
      maxHamming: Int, bands: Int): DataFrame =
    bandedHammingPairs(sigs, idCol, 60, maxHamming, bands)

  /** [[phashPairsFromSigs]] generalized over the signature WIDTH, so the
    * audio fingerprint (32-bit) and the pHash (60-bit) share one banding
    * + verify core.
    */
  def bandedHammingPairs(sigs: DataFrame, idCol: String, bits: Int,
      maxHamming: Int, bands: Int): DataFrame = {
    require(bands >= 1 && bits % bands == 0, s"bands must divide $bits")
    val w = bits / bands
    require(maxHamming < bands,
      s"banding is only complete for maxHamming < bands ($maxHamming/$bands)")
    val banded = sigs
      .select(col(idCol), col("sig"),
        explode(lit((0 until bands).toArray)).as("band"))
      .withColumn("bkey",
        expr(s"shiftright(sig, band * $w)").bitwiseAND(lit((1L << w) - 1)))
    val l = banded.select(col("band"), col("bkey"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bkey"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()   // a pair can collide in several bands
      .withColumn("hamming", Dedup.hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Per-video SHOT-SIGNATURE sets — the clip-level identity
    * [[shotBoundaries]] stops short of: each shot (maximal frame run
    * between boundary jumps) keyed by its frame-signature sequence joined
    * with '-'. A re-encoded or re-cut ingest of the same clip shares its
    * complete interior shots (frame signatures depend only on payload +
    * frame index), so shot-key SET similarity is the video analog of the
    * audio energy-delta fingerprint. Same decode discipline as
    * shotBoundaries: one pass, per-row state bounded by n_frames, output
    * one row per DISTINCT shot key.
    */
  def videoShotKeys(media: DataFrame, idCol: String = "doc_id",
      threshold: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("shot_key", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("meta.kind") === "video")
      .select(col(idCol), col("payload"),
        col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val id = r.getLong(0)
          val n = r.getInt(2)
          val keys = scala.collection.mutable.LinkedHashSet.empty[String]
          var sb = new StringBuilder
          var prev = -1
          var f = 0
          while (f < n) {
            val sig = StubCodec.frameSignature(payload, f)
            if (f > 0 && math.abs(sig - prev) > threshold) {
              keys += sb.toString; sb = new StringBuilder
            }
            if (sb.nonEmpty) sb.append('-')
            sb.append(sig)
            prev = sig
            f += 1
          }
          if (n > 0) keys += sb.toString
          keys.iterator.map(k => Row(id, k))
        }
      }(enc)
  }

  /** Video-level near-duplicate pairs: MinHash-LSH over the
    * [[videoShotKeys]] sets (8 draws, 4 bands of 2 — the repo's document
    * MinHash convention with shot keys as the shingles), candidates
    * verified by EXACT set Jaccard, kept iff jaccard ≥ 1/2 (the integer
    * test 2·|∩| ≥ |∪| — no float on the threshold). Catches the
    * re-ingested / re-cut clip: a truncated copy shares every interior
    * shot, only the cut-point shot key differs.
    *
    * Scale shape: corpus → shot-key rows (one decode pass) → 8 md5 draws
    * + band buckets (hash-aggs) → band-bucket equi-join (linear candidate
    * mass, never all-pairs) → per-candidate exact intersection via one
    * keyed join. LSH recall is the standard 1−(1−J²)^4 curve, replayed
    * EXACTLY by the oracle (same draws, same bands).
    */
  def videoDupPairs(media: DataFrame, idCol: String = "doc_id",
      threshold: Int = 64): DataFrame = {
    // reused three times (draws, sizes, intersection): eager cut
    val keys = videoShotKeys(media, idCol, threshold).localCheckpoint(true)
    val mh = keys
      .select(col(idCol), explode(lit((0 until 8).toArray)).as("s"),
        col("shot_key"))
      .withColumn("h", md5(concat(col("s").cast("string"), lit(":"),
        col("shot_key")).cast("binary")))
      .groupBy(col(idCol), col("s")).agg(min(col("h")).as("h"))
    // rows-per-band = 2: band key = even-draw min || odd-draw min
    val bands = mh.withColumn("band", expr("s div 2"))
      .groupBy(col(idCol), col("band"))
      .agg(concat(min(when(col("s") % 2 === 0, col("h"))),
        min(when(col("s") % 2 === 1, col("h")))).as("bkey"))
    val cand = bands.select(col("band"), col("bkey"), col(idCol).as("id_a"))
      .join(bands.select(col("band"), col("bkey"), col(idCol).as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint(true)
    val sizes = keys.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(keys.select(col(idCol).as("id_a"), col("shot_key")),
        Seq("id_a"))
      .join(keys.select(col(idCol).as("id_b"), col("shot_key")),
        Seq("id_b", "shot_key"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    cand.join(inter, Seq("id_a", "id_b"))
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")),
        Seq("id_b"))
      .filter(col("n_common") * 2 >= col("n_a") + col("n_b") - col("n_common"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Recall grade for [[videoDupPairs]] against a PLANTED pair list — the
    * opq_recall/ann_recall discipline applied to the video LSH path: the
    * exact shot-set Jaccard of every planted pair (a dictionary-scale
    * keyed join — the planted list is tiny), the gate subset, and how
    * many of those the banded MinHash path recovered. The banding's
    * 1−(1−J²)^bands recall curve becomes a measured number instead of a
    * formula.
    *
    * @param planted (id_a, id_b) ground-truth duplicate pairs
    * @return one row: (n_planted, n_above_gate, n_recovered, recall) —
    *         recall NULL when nothing clears the gate
    */
  def videoDupRecall(media: DataFrame, planted: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val keys = videoShotKeys(media, idCol).localCheckpoint(true)
    val sizes = keys.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val pl = planted.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val inter = pl
      .join(keys.select(col(idCol).as("id_a"), col("shot_key")), Seq("id_a"))
      .join(keys.select(col(idCol).as("id_b"), col("shot_key")),
        Seq("id_b", "shot_key"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val truth = pl
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")),
        Seq("id_b"))
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("nc", coalesce(col("n_common"), lit(0L)))
      .withColumn("above",
        col("nc") * 2 >= col("n_a") + col("n_b") - col("nc"))
      .localCheckpoint(true)
    val found = videoDupPairs(media, idCol)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    truth.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_planted"),
        sum(col("above").cast("long")).as("n_above_gate"),
        sum(when(col("above"), coalesce(col("hit"), lit(0L)))
          .otherwise(0L)).as("n_recovered"))
      .select(col("n_planted"), col("n_above_gate"), col("n_recovered"),
        when(col("n_above_gate") > 0,
          round(col("n_recovered").cast("double") /
            col("n_above_gate").cast("double"), 6)).as("recall"))
  }

  /** Cross-modal alignment-score filter — the CLIP-score curation step
    * (Radford et al. 2021; the LAION-400M/5B pipeline, Schuhmann et al.
    * 2021, keeps an image-text pair iff the cosine of its CLIP embeddings
    * clears a threshold). The embedding MODEL is upstream (the codec-seam
    * rule: payload → embedding is the stubbed/exogenous step); the
    * engine's job is the pairing and the filter over two embedding
    * columns, and that is all-Spark: a keyed 1:1 equi-join of the text
    * side against the image side plus one fixed-shape cosine expression.
    *
    * Determinism: cosines quantize to exact micro-longs over
    * [[Similarity.quantize]]d vectors — integer dots, one double division,
    * one round — the bitext/ann convention, so any engine replays the
    * keep/drop decision bit-for-bit (no float-boundary flapping on the
    * threshold).
    *
    * Scale shape: shuffle on the pair key only (corpus-linear, no pair
    * explosion, nothing broadcasts with the corpus); at 100 TB both sides
    * bucket by the pair key and the join co-locates.
    *
    * @param text  rows of (`keyCol`, `vecCol`) — the caption/text side
    * @param image rows of (`keyCol`, `vecCol`) — the image side
    * @param thresholdMicro keep iff cos_micro ≥ this (e.g. 280000 ≈ the
    *                       LAION 0.28 CLIP-score gate)
    * @return (`keyCol`, cos_micro, aligned) — one row per paired key
    */
  def alignmentScore(
      text: DataFrame,
      image: DataFrame,
      keyCol: String,
      vecCol: String,
      thresholdMicro: Long): DataFrame = {
    val t = text.select(col(keyCol),
      Similarity.quantize(col(vecCol)).as("__tv"))
    val i = image.select(col(keyCol),
      Similarity.quantize(col(vecCol)).as("__iv"))
    t.join(i, Seq(keyCol))
      .withColumn("cos_micro",
        round(Similarity.cosineQuantized(col("__tv"), col("__iv")) * 1e6)
          .cast("long"))
      .select(col(keyCol), col("cos_micro"),
        (col("cos_micro") >= thresholdMicro).as("aligned"))
  }

  /** Image-quality screening panel from REAL pixels — the LAION-style
    * curation gate a multimodal pipeline applies BEFORE it pays for
    * fingerprinting/embedding (Schuhmann et al. 2021 filter on size/
    * aspect/score; production image-curation stacks add blur and
    * exposure screens): per image over the decoded 8×8 gray grid
    * ([[Codec.gridOrStub]] — real decode for recognized payloads, the
    * md5 stub grid otherwise, so text-corpus oracle queries replay):
    *
    *  - blur: variance of the 3×3 LAPLACIAN response 4p − pN − pS − pE
    *    − pW over the 36 interior cells (variance-of-Laplacian is the
    *    classic no-reference sharpness measure, Pech-Pacheco et al.
    *    ICPR 2000) — LOW variance = flat response = blurry;
    *  - exposure: mean (brightness), population std-dev (contrast),
    *    and the extreme-pixel fractions (≤ 25 dark, ≥ 230 bright —
    *    clipped-shadow / blown-highlight mass).
    *
    * Exact integers end to end: the mapPartitions seam emits ONLY long
    * sums (Σp, Σp², ΣL, ΣL², dark/bright counts — each bounded by
    * 64·255² so nothing approaches overflow); the five floats are
    * Catalyst round()s of fixed-order expressions over those longs
    * (population variance as (n·Σx² − (Σx)²)/n², one correctly-rounded
    * sqrt for contrast), mirrored verbatim by the oracle.
    *
    * Scale shape: one decode pass (the [[decodeFeatures]] contract —
    * pair with [[repartitionBySize]] for skewed blobs), zero shuffle:
    * the panel is per-row. At 100 TB this is a pure map stage.
    */
  def imageQuality(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sum_px", LongType, nullable = false),
      StructField("sumsq_px", LongType, nullable = false),
      StructField("lap_sum", LongType, nullable = false),
      StructField("lap_sumsq", LongType, nullable = false),
      StructField("n_dark", IntegerType, nullable = false),
      StructField("n_bright", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.filter(col("meta.kind") === "image")
      .select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val g = Codec.gridOrStub(payload)
          var s = 0L; var sq = 0L; var dark = 0; var bright = 0
          var i = 0
          while (i < 64) {
            val p = g(i)
            s += p; sq += p.toLong * p
            if (p <= 25) dark += 1
            if (p >= 230) bright += 1
            i += 1
          }
          var ls = 0L; var lsq = 0L
          var gy = 1
          while (gy < 7) {
            var gx = 1
            while (gx < 7) {
              val k = gy * 8 + gx
              val l = 4L * g(k) - g(k - 8) - g(k + 8) - g(k - 1) - g(k + 1)
              ls += l; lsq += l * l
              gx += 1
            }
            gy += 1
          }
          Row(r.getLong(0), s, sq, ls, lsq, dark, bright)
        }
      }(enc)
      .select(col(idCol), col("sum_px"), col("sumsq_px"), col("lap_sum"),
        col("lap_sumsq"), col("n_dark"), col("n_bright"),
        round(col("sum_px").cast("double") / 64.0, 6).as("brightness"),
        round(sqrt((lit(64L) * col("sumsq_px") -
          col("sum_px") * col("sum_px")).cast("double") / 4096.0), 6)
          .as("contrast"),
        round((lit(36L) * col("lap_sumsq") -
          col("lap_sum") * col("lap_sum")).cast("double") / 1296.0, 6)
          .as("blur_var"),
        round(col("n_dark").cast("double") / 64.0, 6).as("dark_frac"),
        round(col("n_bright").cast("double") / 64.0, 6).as("bright_frac"))
  }
}
