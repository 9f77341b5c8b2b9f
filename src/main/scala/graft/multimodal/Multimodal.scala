package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md north-star): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real and tested (schema, typed Encoders,
  * partition-preserving `mapPartitions` batching — the Scala analog of a
  * Pandas-batch UDF). The codec ([[MediaCodec.decode]]) really decodes
  * PNG/JPEG/GIF/BMP via the in-JDK `javax.imageio`; payloads outside those
  * containers (audio/video — no in-JDK codec) take the deterministic
  * [[MediaCodec.decodeStub]] fallback, so swapping in a full media library
  * still changes one function, none of the plumbing.
  */
case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

case class MediaFeatures(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    mean_intensity: Double,
    histogram: Array[Long])

object MediaCodec {

  // ImageIO's stream factories default to a DISK-backed cache: every
  // ImageIO.read(InputStream) / write(..., OutputStream) creates, fills and
  // deletes a temp FILE under java.io.tmpdir (FileCacheImageInput/
  // OutputStream). That is 1-2 hidden tmpdir round-trips PER IMAGE PER ROW
  // in the m1/m3/m4/m5 hot paths — the same host-I/O exposure that ambushed
  // the k1 spool in two consecutive driver windows (r16 verdict #2/#8).
  // Our payloads are in-memory byte arrays of bounded size, so the
  // memory-backed streams are strictly better and bit-identical. JVM-global
  // flag; runs once when an executor first loads this object.
  javax.imageio.ImageIO.setUseCache(false)
  /** Deterministic fake for payloads no in-JDK codec handles (audio/video
    * containers, synthetic text payloads): derives "pixels" from the raw
    * bytes so the downstream plumbing (batching, schema, aggregation) is
    * fully exercisable and reproducible.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val n = payload.length
    val width = math.max(1, math.min(64, n))
    val height = math.max(1, n / math.max(width, 1))
    val pixels = payload.map(b => b & 0xff)
    (width, height, pixels)
  }

  /** Container sniff by magic bytes — PNG / JPEG / GIF / BMP are the formats
    * the in-JDK `javax.imageio` codecs decode. Cheap (4 byte compares), so
    * the non-image hot path never constructs a reader.
    */
  def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) || // JPEG SOI
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** REAL image decode via `javax.imageio` (in-JDK, zero extra deps):
    * grayscale luma pixels from the decoded raster. Non-image payloads (or
    * corrupt containers) fall back to [[decodeStub]] — audio/video codecs
    * aren't in the JDK, so those kinds stay on the deterministic stub.
    */
  def decode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img =
      if (!looksLikeImage(payload)) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
    if (img == null) decodeStub(payload)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Int](w * h)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer BT.601 luma from sRGB
          px(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          i += 1; x += 1
        }
        y += 1
      }
      (w, h, px)
    }
  }
}

object Multimodal {

  // Same JVM-global ImageIO disk-cache disable as MediaCodec — encode paths
  // (encodeGrayPngPixels) can be hit before any decode loads MediaCodec.
  javax.imageio.ImageIO.setUseCache(false)

  /** Wrap a text/binary source into MediaRecords (binary column + metadata).
    * `kind` is derived deterministically so all downstream group-bys have
    * realistic multi-modal shape.
    */
  def toMedia(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(payloadCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Deterministic 8×8 gray PNG from a payload's bytes — the REAL-codec
    * fixture generator for [[graft.queries.MultimodalQueries]]'s
    * m1_media_features_real (r12 verdict #4): pixel i is byte (i mod n)
    * rendered as r=g=b. PNG encodes RGB losslessly and integer BT.601 luma
    * of (v,v,v) is (299+587+114)·v/1000 = v exactly, so features computed
    * through an ACTUAL `javax.imageio` encode→decode round-trip are pure
    * arithmetic over the source bytes — DuckDB-mirrorable, unlike any real
    * media corpus. TYPE_INT_RGB deliberately, not TYPE_BYTE_GRAY: gray
    * rasters pass through a linear-to-sRGB color conversion in getRGB that
    * would shift the values.
    */
  def encodeGrayPng(payload: Array[Byte]): Array[Byte] = {
    val px = new Array[Int](64)
    var i = 0
    while (i < 64) {
      px(i) = if (payload.isEmpty) 0 else payload(i % payload.length) & 0xff
      i += 1
    }
    encodeGrayPngPixels(8, 8, px)
  }

  /** Encode a luma raster as a real gray PNG (r=g=b per pixel) via
    * `javax.imageio`. TYPE_INT_RGB for the same lossless-round-trip reason
    * as [[encodeGrayPng]]; shared by the fixture generator and
    * [[resizeImage]]'s re-encode.
    */
  def encodeGrayPngPixels(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val v = px(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batched decode + feature extraction: one partition = one batch loop,
    * no per-row task overhead, executes distributed (never on the driver).
    */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { rec =>
        val (w, h, px) = MediaCodec.decode(rec.payload)
        val hist = new Array[Long](8)
        var sum = 0L
        px.foreach { p => hist(p >> 5) += 1; sum += p }
        MediaFeatures(
          rec.doc_id, rec.kind, rec.payload.length.toLong, w, h,
          if (px.isEmpty) 0.0 else sum.toDouble / px.length, hist)
      }
    }
  }

  /** Frame sampling (video analog): every `stride`-th fixed-size window of
    * the payload as one "frame" — pure column ops, no UDF.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(lit(0), ((length(col("payload")) - frameBytes) / stride)).cast("int"))))
      .select(col("doc_id"), col("kind"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * stride + 1, lit(frameBytes)).as("frame"))

  /** REAL image resize (r14 verdict "missing" #2, replacing the former
    * byte-truncate resizeStub): decode the payload through the same
    * dispatch as [[extractFeatures]] (`javax.imageio` for PNG/JPEG/GIF/BMP
    * containers, deterministic stub raster otherwise), resample the luma
    * raster to `tw × th` with the integer nearest-neighbor rule
    * [[phashFromPixels]] already uses (source pixel ((y·h)/th, (x·w)/tw)),
    * and re-encode as a gray PNG — r=g=b round-trips losslessly, so a
    * second decode reads back exactly the resampled luma and the whole
    * decode→resize→re-encode→decode chain stays oracle-checkable
    * (m4_resize). Batched mapPartitions, map-side only, never driver-side.
    */
  def resizeImage(media: Dataset[MediaRecord], tw: Int, th: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { rec =>
        val (w, h, px) = MediaCodec.decode(rec.payload)
        val out = new Array[Int](tw * th)
        var y = 0
        var i = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            out(i) =
              if (px.isEmpty) 0
              else px(((y * h) / th) * w + (x * w) / tw)
            i += 1; x += 1
          }
          y += 1
        }
        MediaRecord(rec.doc_id, rec.kind, encodeGrayPngPixels(tw, th, out))
      }
    }
  }

  /** Fused resize + feature extraction (r15 verdict #7 — m4_resize was the
    * most expensive non-pair benched query at 4.4 s): ONE decode →
    * nearest-neighbor resample → real PNG re-encode, with the features
    * computed DIRECTLY from the resampled luma raster instead of decoding
    * the re-encoded PNG again. Output-identical to
    * `extractFeatures(resizeImage(m))` because the gray PNG round-trip is
    * lossless (r=g=b, BT.601 luma of (v,v,v) = v — the [[encodeGrayPng]]
    * invariant, asserted in MultimodalSpec), so the skipped decode could
    * only ever re-read the same raster. The re-encode itself is KEPT — the
    * resized payload is the operator's real product and `n_bytes` reports
    * its actual PNG size; one `javax.imageio` write per row is the honest
    * remaining codec cost. Same mapPartitions shape, map-side only.
    */
  def resizeFeatures(media: Dataset[MediaRecord], tw: Int, th: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { rec =>
        val (w, h, px) = MediaCodec.decode(rec.payload)
        val out = new Array[Int](tw * th)
        var y = 0
        var i = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            out(i) =
              if (px.isEmpty) 0
              else px(((y * h) / th) * w + (x * w) / tw)
            i += 1; x += 1
          }
          y += 1
        }
        val png = encodeGrayPngPixels(tw, th, out)
        val hist = new Array[Long](8)
        var sum = 0L
        out.foreach { p => hist(p >> 5) += 1; sum += p }
        MediaFeatures(rec.doc_id, rec.kind, png.length.toLong, tw, th,
          sum.toDouble / out.length, hist)
      }
    }
  }

  /** 64-bit perceptual average-hash (aHash) of a decoded luma raster:
    * nearest-neighbor 8×8 downsample, bit j set iff sample j is above the
    * grid mean (compared as s(j)*64 > total — exact integers, no divide).
    * Returned as two 32-bit halves so every engine that overflow-checks
    * BIGINT arithmetic (DuckDB) can mirror it; hamming distance is
    * bit_count(hi⊕hi) + bit_count(lo⊕lo).
    */
  def phashFromPixels(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    // empty payload → stub raster with zero pixels; all-zero hash, no throw
    if (px.isEmpty) return (0L, 0L)
    val s = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 64) {
      val sy = ((j / 8) * h) / 8
      val sx = ((j % 8) * w) / 8
      val v = px(sy * w + sx).toLong
      s(j) = v; total += v; j += 1
    }
    var hi = 0L; var lo = 0L
    j = 0
    while (j < 64) {
      if (s(j) * 64 > total) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** Per-record perceptual hash over the decoded payload (real `imageio`
    * luma for image containers, stub bytes otherwise — same dispatch as
    * [[extractFeatures]]). Map-side only.
    */
  def perceptualHash(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { rec =>
        val (w, h, px) = MediaCodec.decode(rec.payload)
        val (hi, lo) = phashFromPixels(w, h, px)
        (rec.doc_id, hi, lo)
      }
    }.toDF("doc_id", "phash_hi", "phash_lo")
  }

  /** The 8-bit band value for band `b` (0-3 from the lo half, 4-7 hi) —
    * shared by [[phashPairs]] and [[phashPairsDistinct]] so the bucketing
    * cannot drift between the two paths.
    */
  private def bandValueExpr(hi: String, lo: String): String =
    s"CASE WHEN b < 4 THEN shiftright($lo, 8 * b) & 255 " +
      s"ELSE shiftright($hi, 8 * (b - 4)) & 255 END"

  /** Near-duplicate image pairs by banded phash hamming distance: 8 bands
    * of 8 bits — a pair within hamming ≤ 7 must share a zero-diff band
    * (pigeonhole over 8 bands bounds exact recall at bands − 1: distance 8
    * can place one flipped bit in every band), so recall is exact for
    * `maxHamming` ≤ 7. Pairing happens WITHIN each (band, value) bucket
    * after one groupBy shuffle (the FuzzyJoin shape), then candidates are
    * verified with the exact popcount.
    *
    * Scale note: pair fan-out is quadratic WITHIN a (band, value) bucket,
    * so corpora whose hashes concentrate (the low-entropy stub payloads at
    * sf0.1 produce a 442-doc max bucket → 1.7M candidates, absorbed in ~3 s)
    * degrade before diverse real-image corpora do. The dials are standard
    * LSH: widen bands (4×16 bits — exact recall drops to hamming ≤ 4) or
    * cap bucket size with a documented recall cut; both change the
    * candidate contract, so the 8×8 default stays the oracle-gated path.
    * (sf0.1's 442-doc max bucket → 1.7M candidates runs ~1.7 s steady-state
    * under this verify-inside-the-bucket-stage shape.)
    */
  def phashPairs(ph: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "banded recall is exact only for maxHamming <= 7")
    // The hash rides WITH the doc through the band bucket, so each
    // candidate pair is popcount-verified inside the same stage that
    // enumerates it — the distinct (a pair can share several zero-diff
    // bands) then dedupes only the VERIFIED near-dup pairs, not the full
    // within-bucket candidate fan-out, and no join back to `ph` is needed.
    // (The previous shape shuffled every candidate through distinct and
    // re-joined both sides: on the sf0.1 low-entropy fixture that was 1.7M
    // candidate rows through an extra Exchange plus two joins; this shape
    // shuffles only the ≤-maxHamming survivors.)
    val bands = ph.select(
      struct(col("doc_id"), col("phash_hi").as("hi"), col("phash_lo").as("lo"))
        .as("r"),
      explode(expr("sequence(0, 7)")).as("b"))
      .select(col("r"), col("b"),
        expr(bandValueExpr("r.hi", "r.lo")).as("bandv"))
    bands.groupBy(col("b"), col("bandv"))
      // sort_array over struct<doc_id,hi,lo> orders by doc_id first, so
      // pair enumeration still emits doc_a < doc_b.
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .filter(size(col("rs")) >= 2)
      .select(explode(expr(
        graft.operators.BucketPairs.pairExpr("rs", "a", "b"))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        (bit_count(expr("p.a.hi ^ p.b.hi")) + bit_count(expr("p.a.lo ^ p.b.lo")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The SCALE path for [[phashPairs]]: band-bucket candidates enumerated
    * over DISTINCT hash values only, so identical-phash mass — exact image
    * duplicates, or the low-entropy degenerate case where the whole corpus
    * collapses onto few hashes (the 10× probe ran [[phashPairs]] there at
    * 459 s; this shape runs in seconds) — contributes ONE bucket node
    * regardless of multiplicity. Exact-equal doc groups fall out of a plain
    * groupBy on the hash (the D1 shape, no pair enumeration); doc-level
    * near-dup pairs, when actually needed, are the membership join of this
    * frame — but dedup decisions (drop all-but-one per cluster) never need
    * the quadratic doc-pair expansion.
    *
    * Output: (ha_hi, ha_lo, hb_hi, hb_lo, hamming) over distinct hashes,
    * struct-ordered a < b. Equivalence with [[phashPairs]] under membership
    * expansion is asserted in MultimodalSpec.
    */
  def phashPairsDistinct(ph: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "banded recall is exact only for maxHamming <= 7")
    val dh = ph.select(col("phash_hi"), col("phash_lo")).distinct()
    val bands = dh.select(col("phash_hi"), col("phash_lo"),
      explode(expr("sequence(0, 7)")).as("b"))
      .select(col("phash_hi"), col("phash_lo"), col("b"),
        expr(bandValueExpr("phash_hi", "phash_lo")).as("bandv"))
    bands.groupBy(col("b"), col("bandv"))
      .agg(sort_array(collect_list(
        struct(col("phash_hi").as("hi"), col("phash_lo").as("lo")))).as("hs"))
      .filter(size(col("hs")) >= 2)
      .select(explode(expr(
        graft.operators.BucketPairs.pairExpr("hs", "a", "b"))).as("p"))
      .select(col("p.a.hi").as("ha_hi"), col("p.a.lo").as("ha_lo"),
        col("p.b.hi").as("hb_hi"), col("p.b.lo").as("hb_lo"),
        (bit_count(expr("p.a.hi ^ p.b.hi")) + bit_count(expr("p.a.lo ^ p.b.lo")))
          .cast("long").as("hamming"))
      // Verify BEFORE distinct (same reorder as phashPairs): only the
      // ≤-maxHamming survivors pay the dedup shuffle. hamming is a pure
      // function of the pair, so distinct over the 5-tuple equals
      // distinct-pairs-then-verify.
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Deterministic REAL-codec WAV fixture generator — the audio sibling of
    * [[encodeGrayPng]]'s losslessness trick: 64 samples of 16-bit mono PCM
    * at 8 kHz, sample i = (byte(i mod n) − 128) · 256, written through the
    * ACTUAL in-JDK `javax.sound.sampled.AudioSystem` WAVE encoder. PCM is
    * lossless by definition, so features computed through a real
    * encode→parse round-trip are pure integer arithmetic over the source
    * bytes — DuckDB-mirrorable, which no compressed audio codec would be.
    */
  def encodePcmWav(payload: Array[Byte]): Array[Byte] = {
    val n = 64
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val b = if (payload.isEmpty) 0 else payload(i % payload.length) & 0xff
      val s = (b - 128) * 256
      data(2 * i) = (s & 0xff).toByte // little-endian PCM16
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode + feature extraction via the in-JDK
    * `javax.sound.sampled` WAVE parser (closing the "audio is a stub"
    * corner the same way m1_media_features_real closed the image one):
    * the container header — sample rate, channels, bit depth, frame
    * count — comes from the ACTUAL parser, then the standard audio
    * features are exact integers over the decoded PCM stream (peak |s|,
    * energy Σs², strict sign-change zero crossings) plus one mirrored
    * sqrt for RMS. Rejects anything but 16-bit mono little-endian PCM
    * loudly rather than mis-reading it.
    */
  def wavFeatures(id: Long, payload: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian &&
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"unsupported audio format: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var i = 0
    var peak = 0L
    var sumSq = 0L
    var zc = 0L
    var prev = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff))
      if (math.abs(s) > peak) peak = math.abs(s)
      sumSq += s.toLong * s.toLong
      if (i > 0 && prev.toLong * s.toLong < 0L) zc += 1
      prev = s
      i += 1
    }
    AudioFeatures(id, fmt.getSampleRate.toInt, n.toLong, peak, sumSq, zc,
      if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n.toDouble))
  }

  /** Batched audio decode over a payload Dataset — same distributed
    * mapPartitions shape as [[extractFeatures]].
    */
  def extractAudioFeatures(media: Dataset[(Long, Array[Byte])])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { case (id, p) => wavFeatures(id, p) })
  }
}

case class AudioFeatures(
    doc_id: Long,
    sample_rate: Int,
    n_samples: Long,
    peak_abs: Long,
    sum_sq: Long,
    zero_crossings: Long,
    rms: Double)
