package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.scale.{Codec, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"), (2L, "abc"), (3L, "video payload bytes"))
    .toDF("doc_id", "text")

  test("fromDocuments builds payload bytes + typed metadata") {
    val mm = Multimodal.fromDocuments(docs)
    val r = mm.filter($"doc_id" === 1).select($"payload", $"meta.kind",
      $"meta.width", $"meta.n_frames").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") === "hello world")
    assert(r.getString(1) === "audio")   // 1 % 3 = 1 → index 2
    assert(r.getInt(2) === 17 && r.getInt(3) === 2)
  }

  test("decodeFeatures: stub channel stats equal md5 prefix bytes") {
    val out = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
    val r = out.filter($"doc_id" === 2).head()
    val md5 = MessageDigest.getInstance("MD5").digest("abc".getBytes("UTF-8"))
    assert(r.getAs[Int]("n_bytes") === 3)
    assert(r.getAs[Seq[Int]]("features") === md5.take(4).map(_ & 0xff).toSeq)
  }

  test("sampleFrames emits stride-spaced frames for video rows only") {
    val mm = Multimodal.fromDocuments(docs)
    val frames = Multimodal.sampleFrames(mm, stride = 2)
    // only doc 3 is video (3 % 3 = 0 → "image"? index = 0+1 = 1 → image).
    // kinds: doc % 3 = 0→image, 1→audio, 2→video ⇒ doc 2 is video, n_frames=3
    val rows = frames.collect()
    assert(rows.forall(_.getLong(0) == 2L))
    assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(0, 2))
  }

  test("resizeFeatures truncates the feature width") {
    val out = Multimodal.resizeFeatures(
      Multimodal.decodeFeatures(Multimodal.fromDocuments(docs), nChannels = 4), 2)
    assert(out.select(size($"features")).as[Int].collect().forall(_ == 2))
  }

  test("repartitionBySize preserves rows") {
    val mm = Multimodal.fromDocuments(docs)
    assert(Multimodal.repartitionBySize(mm, 2).count() === 3)
  }

  test("phash banding: complete below `bands` flips, excludes beyond max") {
    // planted 60-bit signatures around a base: flip 0/1/2/3 bits (must all
    // pair with base at hamming <= 3), flip 4 spread across distinct bands
    // (candidate via shared band 3 but FILTERED by hamming), flip 15 bits
    // of band 0 only (agrees on bands 1-3 → candidate, filtered), and a
    // far signature (no shared band, never even a candidate)
    val base = 0x0ABCDEF1234567L & ((1L << 60) - 1)
    def flip(s: Long, bits: Seq[Int]): Long =
      bits.foldLeft(s)((v, b) => v ^ (1L << b))
    val sigs = Seq(
      0L -> base,
      1L -> flip(base, Seq(5)),             // hamming 1
      2L -> flip(base, Seq(16, 31)),        // hamming 2, two bands touched
      3L -> flip(base, Seq(0, 15, 30)),     // hamming 3, three bands
      4L -> flip(base, Seq(0, 1, 15, 16)),  // hamming 4, bands 2-3 still
                                            // agree → candidate, FILTERED
      5L -> flip(base, (0 until 15)),       // band 0 inverted → excluded
      6L -> (~base & ((1L << 60) - 1))      // all bits differ
    ).toDF("doc_id", "sig")
    val pairs = Multimodal.phashPairsFromSigs(sigs, "doc_id", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) == 2)
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) == 3)
    assert(!pairs.contains((0L, 4L)), "hamming-4 pair must be filtered")
    assert(!pairs.contains((0L, 5L)), "inverted-band pair must be filtered")
    assert(!pairs.contains((0L, 6L)), "far pair must not even be a candidate")
    // derived near-dups of each other also pair (1,2): hamming 3
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 3)
  }

  test("dctPhash: planted near-dup GRIDS land at small hamming, " +
    "different grids far — recovered through the banding pipeline") {
    // a deterministic "image": smooth gradient + texture, values 0..255
    def base(k: Int): Int = {
      val (r, c) = (k / 8, k % 8)
      (r * 20 + c * 10 + ((r * c * 7) % 31)) % 256
    }
    val gridA = Array.tabulate(64)(base)
    // near-dup: tiny luminance wobble on three pixels (a re-encode /
    // slight crop artifact) — DCT coefficients move by ≤ 3·1024² each,
    // far less than the coefficient spread, so few median bits flip
    val gridB = gridA.clone()
    gridB(9) += 2; gridB(27) -= 1; gridB(40) += 1
    // different image: inverted gradient
    val gridC = Array.tabulate(64)(k => 255 - base(k))
    val (sa, sb, sc) = (Multimodal.dctPhash(gridA),
      Multimodal.dctPhash(gridB), Multimodal.dctPhash(gridC))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sa, sb) <= 3, s"near-dup grids at hamming ${ham(sa, sb)}")
    assert(ham(sa, sc) > 3, s"distinct grids at hamming ${ham(sa, sc)}")
    // and the pair survives the real banding + verify pipeline
    val pairs = Multimodal.phashPairsFromSigs(
      Seq(1L -> sa, 2L -> sb, 3L -> sc).toDF("doc_id", "sig"),
      "doc_id", 3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup pair not recovered")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("dctPhash is invariant under global brightness shift (the DC " +
    "coefficient carries luminance; all 60 AC terms cancel it)") {
    // a defining perceptual-hash property a cryptographic hash cannot
    // have: adding a constant to every pixel moves ONLY C(0,0) — for
    // every u>0 the cosQ(u,·) row sums to (quantized) zero — so the
    // signature is bit-identical. Exact here because Σ_r cosQ(u·8+r) = 0
    // holds exactly for the symmetric quantized table.
    def base(k: Int): Int = (k * 37 % 83) + ((k * k) % 41)
    val g1 = Array.tabulate(64)(base)
    val g2 = g1.map(_ + 57)
    assert(Multimodal.dctPhash(g1) == Multimodal.dctPhash(g2))
    // sanity: the quantized cosine rows do cancel constants exactly
    for (u <- 1 until 8)
      assert((0 until 8).map(r => Multimodal.cosQ(u * 8 + r)).sum == 0,
        s"row $u of the cosine table does not cancel constants")
  }

  test("phashPairs finds exact-payload duplicates at hamming 0") {
    val dup = Seq(
      (10L, "same bytes"), (11L, "same bytes"), (12L, "other bytes"))
      .toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(dup)
    val got = Multimodal.phashPairs(media).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 10L && got(0).getLong(1) == 11L
      && got(0).getInt(2) == 0)
  }

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("Codec.decodeGray parses the checked-in P6 fixture exactly") {
    val bytes = resourceBytes("fixture_gradient_32x32.ppm")
    val Some((w, h, px)) = Codec.decodeGray(bytes)
    assert(w == 32 && h == 32 && px.length == 32 * 32)
    // corner pixels recomputed by hand from the generator formula:
    // (0,0) r=0 g=0 b=255 (on the diagonal stripe) -> luma (114*255+500)/1000
    assert(px(0) == (114 * 255 + 500) / 1000)
    // (31,31): r=255 g=255 b=255 -> 255
    assert(px(32 * 32 - 1) == 255)
    // a P5 re-encode of the decoded grays parses back identically
    val hdr = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val p5 = hdr ++ px.map(_.toByte)
    assert(Codec.decodeGray(p5).exists { case (w2, h2, px2) =>
      w2 == w && h2 == h && px2.sameElements(px) })
  }

  test("Codec: PNG (javax.imageio branch) decodes to the same grays " +
      "as the PPM parser") {
    val Some((w, h, px)) = Codec.decodeGray(
      resourceBytes("fixture_gradient_32x32.ppm"))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(y * w + x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val Some((w2, h2, px2)) = Codec.decodeGray(bos.toByteArray)
    assert(w2 == w && h2 == h)
    // gray-in → luma weights sum to 1000 → gray-out, bit-exact
    assert(px2.sameElements(px))
  }

  test("Codec: maxval < 255 rescales to full range; 1x1 minimal PGM parses") {
    // legal maxval-15 PGM: samples 0..15 must decode to 0..255, not
    // near-black (15 -> 255, 7 -> round(7*255/15) = 119, 0 -> 0)
    val hdr = "P5\n4 1\n15\n".getBytes("US-ASCII")
    val pgm = hdr ++ Array[Byte](0, 7, 15, 15)
    val Some((w, h, px)) = Codec.decodeGray(pgm)
    assert(w == 4 && h == 1)
    assert(px.toSeq == Seq(0, (7 * 255 + 7) / 15, 255, 255))
    // color path rescales per channel before the luma mix
    val ppm = "P6\n1 1\n3\n".getBytes("US-ASCII") ++ Array[Byte](3, 3, 3)
    assert(Codec.decodeGray(ppm).exists(_._3.sameElements(Array(255))))
    // the smallest real PNM (12 bytes) decodes — no arbitrary 16-byte floor
    val tiny = "P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](42)
    assert(tiny.length == 12)
    assert(Codec.decodeGray(tiny).exists { case (w2, h2, p2) =>
      w2 == 1 && h2 == 1 && p2.sameElements(Array(42)) })
  }

  test("non-image payloads fall back to the md5 stub grid (oracle parity)") {
    val text = "just some document text".getBytes("UTF-8")
    assert(Codec.gridOrStub(text)
      .sameElements(Multimodal.StubCodec.grayGrid(text)))
    // a payload that merely STARTS like a PPM but has the wrong raster
    // length must not decode either
    val fake = "P6 9 9 255 not-actually-pixels".getBytes("US-ASCII")
    assert(Codec.decodeGray(fake).isEmpty)
    assert(Codec.gridOrStub(fake)
      .sameElements(Multimodal.StubCodec.grayGrid(fake)))
  }

  test("REAL decode path end-to-end: the fixture image and its planted " +
      "near-duplicate survive decode → DCT → banding; unrelated does not") {
    val base = resourceBytes("fixture_gradient_32x32.ppm")
    val near = resourceBytes("fixture_gradient_32x32_neardup.ppm")
    assert(!base.sameElements(near))
    // an unrelated image: the fixture mirrored horizontally — same pixel
    // population, completely different spatial structure
    val Some((w, h, px)) = Codec.decodeGray(base)
    val mirrored = {
      val hdr = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
      val mpx = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        mpx(y * w + x) = px(y * w + (w - 1 - x)).toByte
      hdr ++ mpx
    }
    val media = Seq(
      (1L, base), (2L, near), (3L, mirrored))
      .toDF("doc_id", "payload")
    val got = Multimodal.phashPairs(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)),
      "planted near-duplicate image not recovered through the real decode")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      "mirrored image must not collide with the original")
  }

  /** 8×8 grayscale PGM from 64 pixel values (grayGrid8 is identity at
    * exactly 8×8, so the panel reads these pixels verbatim).
    */
  private def pgm8(px: Seq[Int]): Array[Byte] =
    "P5\n8 8\n255\n".getBytes("US-ASCII") ++ px.map(_.toByte).toArray

  private def mediaOf(rows: (Long, Array[Byte])*) =
    rows.toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("image").as("kind"),
        lit(8).cast("int").as("width"), lit(8).cast("int").as("height"),
        lit(0).cast("int").as("sample_rate"),
        lit(0).cast("int").as("n_frames")))

  test("imageQuality: hand-computed panel on real pixels — flat field, " +
      "checkerboard vs smooth ramp sharpness ranking, stub fallback") {
    val flat = pgm8(Seq.fill(64)(100))
    val checker = pgm8((0 until 64).map(k =>
      if ((k / 8 + k % 8) % 2 == 0) 0 else 255))
    // linear horizontal ramp: Laplacian of a linear function is 0 on the
    // interior — the maximally "blurry" (flat-response) structured image
    val ramp = pgm8((0 until 64).map(k => (k % 8) * 255 / 7))
    val textPayload = "not an image at all".getBytes("UTF-8")
    val out = Multimodal.imageQuality(mediaOf(
        1L -> flat, 2L -> checker, 3L -> ramp, 4L -> textPayload))
      .collect().map(r => r.getLong(0) -> r).toMap

    val f = out(1L)
    assert(f.getLong(1) === 6400L && f.getLong(2) === 640000L) // Σp, Σp²
    assert(f.getLong(3) === 0L && f.getLong(4) === 0L)         // Laplacian
    assert(f.getInt(5) === 0 && f.getInt(6) === 0)
    assert(f.getAs[Double]("brightness") === 100.0)
    assert(f.getAs[Double]("contrast") === 0.0)
    assert(f.getAs[Double]("blur_var") === 0.0)

    // checkerboard: every interior Laplacian is ±(4·255) = ±1020, 18 of
    // each sign → Σl = 0, Σl² = 36·1020², variance = 1020²
    val c2 = out(2L)
    assert(c2.getLong(3) === 0L && c2.getLong(4) === 36L * 1020 * 1020)
    assert(c2.getAs[Double]("blur_var") === 1020.0 * 1020.0)
    assert(c2.getInt(5) === 32 && c2.getInt(6) === 32)
    assert(c2.getAs[Double]("brightness") === 127.5)
    // ramp: near-zero interior Laplacian response (the k*255/7 integer
    // rounding leaves ±1 blips) — ranks maximally blurry
    val r3 = out(3L)
    assert(r3.getAs[Double]("blur_var") < 1.0)
    assert(c2.getAs[Double]("blur_var") > r3.getAs[Double]("blur_var"),
      "sharp checkerboard must out-rank the smooth ramp")
    // ramp columns are k*255/7 = 0,36,72,109,145,182,218,255: only the 0
    // column is dark (<= 25) and only the 255 column bright (>= 230)
    assert(r3.getInt(5) === 8 && r3.getInt(6) === 8)

    // stub branch: the panel over the md5 grid, replicated in plain JVM
    val g = Multimodal.StubCodec.grayGrid(textPayload)
    val s4 = out(4L)
    assert(s4.getLong(1) === g.map(_.toLong).sum)
    assert(s4.getLong(2) === g.map(p => p.toLong * p).sum)
    val lap = for (gy <- 1 to 6; gx <- 1 to 6) yield {
      val k = gy * 8 + gx
      4L * g(k) - g(k - 8) - g(k + 8) - g(k - 1) - g(k + 1)
    }
    assert(s4.getLong(3) === lap.sum && s4.getLong(4) === lap.map(l => l * l).sum)
  }

  test("grayGrid8 box filter: constant image -> constant grid; " +
      "tiny frames replicate edges") {
    val const = Array.fill(16 * 16)(77)
    assert(Codec.grayGrid8(16, 16, const).forall(_ == 77))
    val one = Codec.grayGrid8(1, 1, Array(42))
    assert(one.length == 64 && one.forall(_ == 42))
  }

  /** Minimal RIFF/PCM16 builder: frames = rows of `ch` channel values. */
  private def wavBytes(rate: Int, ch: Int,
      frames: Seq[Seq[Int]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val dataLen = frames.size * ch * 2
    tag("RIFF"); le32(36 + dataLen); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(ch); le32(rate)
    le32(rate * ch * 2); le16(ch * 2); le16(16)
    tag("data"); le32(dataLen)
    frames.foreach(_.foreach(v => le16(if (v < 0) v + 0x10000 else v)))
    bos.toByteArray
  }

  test("decodePcmWav: real mono/stereo PCM parses with truncating " +
      "downmix; compressed/garbage payloads refuse to the stub") {
    val mono = wavBytes(8000, 1, Seq(100, -100, 50, 0, -50).map(Seq(_)))
    val Some((rate, s)) = Codec.decodePcmWav(mono)
    assert(rate == 8000 && s.toSeq == Seq(100, -100, 50, 0, -50))
    // stereo downmix: truncating integer mean, toward zero on negatives
    val st = wavBytes(16000, 2, Seq(Seq(100, 50), Seq(-99, -50)))
    assert(Codec.decodePcmWav(st).get._2.toSeq == Seq(75, -74))
    // non-PCM format code refuses; truncated header refuses
    val bad = wavBytes(8000, 1, Seq(Seq(1)))
    bad(20) = 2 // format = ADPCM
    assert(Codec.decodePcmWav(bad).isEmpty)
    assert(Codec.decodePcmWav("hello, not audio".getBytes("UTF-8")).isEmpty)
    // the seam: non-WAV payloads flow to the md5 stub waveform
    val stub = Codec.samplesOrStub("hello".getBytes("UTF-8"))
    assert(stub.length == 256 && stub.forall(v => v >= -128 && v <= 127))
    assert(stub.toSeq == Multimodal.StubCodec
      .audioSamples("hello".getBytes("UTF-8")).toSeq)
  }

  test("audioFingerprint: energy-delta bits over a real WAV with known " +
      "frame energies; zero-padding past the clip; banded pairing at 32 " +
      "bits is complete for planted near signatures") {
    // frames of 8: loud(100) / silent / loud / silent -> energies
    // 80000, 0, 80000, 0, then zero padding: only bit 1 (e2 > e1) sets
    val frames = Seq.fill(8)(100) ++ Seq.fill(8)(0) ++
      Seq.fill(8)(100) ++ Seq.fill(8)(0)
    val df = Seq((1L, wavBytes(8000, 1, frames.map(Seq(_)))))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("audio").as("kind")))
    val sig = Multimodal.audioFingerprint(df).collect()(0).getLong(1)
    assert(sig == 2L, s"expected bit 1 only, got $sig")
    // planted signatures: hamming 1 pairs, hamming 16 does not
    val sigs = Seq((1L, 0L), (2L, 1L), (3L, 0x0F0F0F0FL))
      .toDF("doc_id", "sig")
    val pairs = Multimodal.bandedHammingPairs(sigs, "doc_id", 32, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("shotBoundaries: matches a direct signature walk; single-frame " +
      "video is one shot") {
    val media = Multimodal.fromDocuments(
      Seq((2L, "some video payload"), (5L, "another clip"))
        .toDF("doc_id", "text"))
    val got = Multimodal.shotBoundaries(media).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val expected = Seq((2L, "some video payload"), (5L, "another clip"))
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val n = (id % 30 + 1).toInt
        val sigs = (0 until n)
          .map(Multimodal.StubCodec.frameSignature(payload, _))
        val bounds = sigs.sliding(2)
          .count(w => w.size == 2 && math.abs(w(1) - w(0)) > 64)
        (id, (n, bounds + 1))
      }.toMap
    assert(got == expected)
    // a 1-frame video (doc_id 30 -> n_frames 1, kind video needs id%3==0?
    // fromDocuments: kind video iff doc_id % 3 == 2 -> use 32: 32%30+1=3
    // frames; instead pin n_frames=1 via a direct meta struct
    val one = Seq((9L, "x".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("video").as("kind"),
        lit(1).as("n_frames")))
    assert(Multimodal.shotBoundaries(one).collect()(0).getInt(2) == 1)
  }

  test("audioStats: hand-computed panel over a real WAV; peak/crossings/" +
      "silence exact, RMS = sqrt(sumsq/n) mirrored") {
    // samples 100,-100,50,0,-50: peak 100; crossings: (100,-100) and
    // (-100,50) — zero products don't cross; sumsq = 25000 ->
    // rms = sqrt(5000) = 70.710678; |0| <= 4 -> silence 1/5
    val df = Seq((1L, wavBytes(8000, 1,
        Seq(100, -100, 50, 0, -50).map(Seq(_)))))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("audio").as("kind")))
    val r = Multimodal.audioStats(df).collect()(0)
    assert(r.getAs[Int]("n_samples") == 5 && r.getAs[Int]("peak") == 100)
    assert(r.getAs[Int]("zero_crossings") == 2)
    assert(r.getAs[Double]("rms") == 70.710678)
    assert(r.getAs[Double]("silence_frac") == 0.2)
    // non-audio kinds are out of scope for the panel
    val img = df.withColumn("meta", struct(lit("image").as("kind")))
    assert(Multimodal.audioStats(img).count() == 0L)
  }

  test("videoShotKeys: segmentation matches a JVM frame-walk replica; " +
      "repeated shot keys dedup to one row") {
    val text = "the quick brown fox jumps over the lazy dog"
    val mm = Multimodal.fromDocuments(Seq((26L, text)).toDF("doc_id", "text"))
    val got = Multimodal.videoShotKeys(mm).collect()
      .map(_.getString(1)).toSet
    // replica: md5(payload ++ frame-index-string) first byte, break > 64
    val sigs = (0 until 27).map { f =>
      MessageDigest.getInstance("MD5")
        .digest((text + f.toString).getBytes("UTF-8"))(0) & 0xff
    }
    val keys = scala.collection.mutable.LinkedHashSet.empty[String]
    var cur = List.empty[Int]
    sigs.zipWithIndex.foreach { case (s, f) =>
      if (f > 0 && math.abs(s - cur.head) > 64) {
        keys += cur.reverse.mkString("-"); cur = Nil
      }
      cur = s :: cur
    }
    keys += cur.reverse.mkString("-")
    assert(got === keys.toSet)
  }

  test("videoDupRecall: exact-Jaccard truth gates the planted list; " +
      "recovered/above-gate counted apart") {
    val fox = "the quick brown fox jumps over the lazy dog"
    val mm = Multimodal.fromDocuments(Seq(
      (26L, fox), (29L, fox), (11L, fox),
      (23L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text"))
    // planted: (26,29) J=17/19 above gate + found; (11,29) J=6/19 below
    val planted = Seq((26L, 29L), (11L, 29L)).toDF("id_a", "id_b")
    val r = Multimodal.videoDupRecall(mm, planted).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((2L, 1L, 1L, 1.0)))
  }

  test("videoDupPairs: planted re-cut clip recovered with exact set " +
      "Jaccard; low-overlap stub and foreign clip stay out") {
    val fox = "the quick brown fox jumps over the lazy dog"
    // 26 -> 27 frames, 29 -> the 30-frame re-cut (17 of 19 shots shared),
    // 11 -> a 12-frame stub of the same clip (6/19 — below the 1/2 gate),
    // 23 -> an unrelated clip
    val mm = Multimodal.fromDocuments(Seq(
      (26L, fox), (29L, fox), (11L, fox),
      (23L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text"))
    val got = Multimodal.videoDupPairs(mm).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((26L, 29L, 17L, 19L, 17L)))
    assert(r.getDouble(5) === BigDecimal(17.0 / 19.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
