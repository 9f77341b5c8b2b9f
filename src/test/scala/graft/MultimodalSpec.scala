package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaCodec, Multimodal}

/** The REAL image path: in-JDK `imageio` decode plus the perceptual-hash
  * dedup built on it. The m3 oracle gates the stub-decode pipeline on the
  * fixture; these tests pin what only a true PNG can — container sniffing,
  * raster dims, BT.601 luma, and phash behavior under perturbation and
  * inversion.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def phashOf(bytes: Array[Byte]): (Long, Long) = {
    val (w, h, px) = MediaCodec.decode(bytes)
    Multimodal.phashFromPixels(w, h, px)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  // 8×8-block checkerboard: every phash grid sample lands on a block corner,
  // so the hash is the exact checkerboard bit pattern with no ties.
  private def checker(invert: Boolean) = png(64, 64) { (x, y) =>
    val on = (x / 8 + y / 8) % 2 == 0
    if (on != invert) 0x000000 else 0xffffff
  }

  test("real PNG decode: sniffed, true raster dims, BT.601 luma endpoints") {
    val bytes = png(16, 8)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    assert(MediaCodec.looksLikeImage(bytes))
    val (w, h, px) = MediaCodec.decode(bytes)
    assert(w == 16 && h == 8 && px.length == 128)
    assert(px(0) == 0 && px(15) == 255)
    // non-image payloads must fall back to the stub, not throw
    val (sw, _, spx) = MediaCodec.decode("not an image".getBytes("UTF-8"))
    assert(sw == 12 && spx.length == 12)
    // empty payload → zero-pixel stub raster → all-zero hash, no throw
    val (ew, eh, epx) = MediaCodec.decode(Array.empty[Byte])
    assert(epx.isEmpty && Multimodal.phashFromPixels(ew, eh, epx) == ((0L, 0L)))
  }

  test("encodeGrayPng round-trips source bytes exactly through the real codec") {
    // the m1_media_features_real contract: encode → real imageio decode →
    // luma recovers byte (i mod n) EXACTLY (PNG lossless RGB + luma(v,v,v)=v)
    val payload = "The quick brown fox".getBytes("UTF-8")
    val bytes = Multimodal.encodeGrayPng(payload)
    assert(MediaCodec.looksLikeImage(bytes), "generated PNG must sniff as image")
    val (w, h, px) = MediaCodec.decode(bytes)
    assert(w == 8 && h == 8 && px.length == 64)
    (0 until 64).foreach { i =>
      assert(px(i) == (payload(i % payload.length) & 0xff),
        s"pixel $i diverged from source byte")
    }
    // empty payload → all-zero raster, still a real decodable PNG
    val (ew, eh, epx) = MediaCodec.decode(Multimodal.encodeGrayPng(Array.empty))
    assert(ew == 8 && eh == 8 && epx.forall(_ == 0))
  }

  test("resizeImage: nearest-neighbor resample content, real PNG both ways") {
    implicit val s = spark
    // 16×8 left-black/right-white: any downsample keeps the halves exact
    val src = png(16, 8)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val media = Seq(graft.multimodal.MediaRecord(1L, "image", src)).toDS()
    val out = Multimodal.resizeImage(media, 4, 2).collect().head
    assert(MediaCodec.looksLikeImage(out.payload), "re-encode must be a real PNG")
    val (w, h, px) = MediaCodec.decode(out.payload)
    assert(w == 4 && h == 2)
    // columns 0-1 sample x∈{0,4} (black), 2-3 sample x∈{8,12} (white)
    assert(px.toSeq == Seq(0, 0, 255, 255, 0, 0, 255, 255))
    // upsample: 1×1 gray → 3×3 constant
    val one = png(1, 1)((_, _) => 0x7f7f7f)
    val up = Multimodal.resizeImage(
      Seq(graft.multimodal.MediaRecord(2L, "image", one)).toDS(), 3, 3)
      .collect().head
    val (uw, uh, upx) = MediaCodec.decode(up.payload)
    assert(uw == 3 && uh == 3 && upx.forall(_ == 0x7f))
    // non-image payload goes through the stub raster, same resample rule
    val stub = Multimodal.resizeImage(
      Seq(graft.multimodal.MediaRecord(3L, "audio",
        "abcd".getBytes("UTF-8"))).toDS(), 2, 1)
      .collect().head
    val (sw2, sh2, spx2) = MediaCodec.decode(stub.payload)
    // stub raster is 4×1 'a','b','c','d'; NN to 2×1 samples x∈{0,2}
    assert(sw2 == 2 && sh2 == 1 && spx2.toSeq == Seq('a'.toInt, 'c'.toInt))
  }

  test("resizeFeatures equals extractFeatures∘resizeImage (the r15 #7 fusion " +
      "skips only the provably-lossless second decode)") {
    implicit val s = spark
    val media = Seq(
      graft.multimodal.MediaRecord(1L, "image",
        png(16, 8)((x, _) => if (x < 8) 0x000000 else 0xffffff)),
      graft.multimodal.MediaRecord(2L, "image",
        Multimodal.encodeGrayPng("some document text".getBytes("UTF-8"))),
      graft.multimodal.MediaRecord(3L, "audio", "abcd".getBytes("UTF-8")),
      graft.multimodal.MediaRecord(4L, "image", Array.empty[Byte])).toDS()
    def canon(fs: Seq[graft.multimodal.MediaFeatures]) =
      fs.sortBy(_.doc_id).map(f => (f.doc_id, f.kind, f.n_bytes, f.width,
        f.height, f.mean_intensity, f.histogram.toSeq))
    val fused = canon(Multimodal.resizeFeatures(media, 4, 4).collect().toSeq)
    val chained = canon(Multimodal.extractFeatures(
      Multimodal.resizeImage(media, 4, 4)).collect().toSeq)
    assert(fused == chained)
  }

  test("phash: single-pixel perturbation flips one bit; inversion flips all 64") {
    val base = phashOf(checker(invert = false))
    val inverted = phashOf(checker(invert = true))
    assert(hamming(base, inverted) == 64)
    val perturbed = phashOf(png(64, 64) { (x, y) =>
      if (x == 0 && y == 0) 0xffffff
      else if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff
    })
    assert(hamming(base, perturbed) == 1)
  }

  test("distinct-hash scale path expands to exactly the doc-level pair set") {
    implicit val s = spark
    val media = Multimodal.toMedia(
      Tables(spark, sf, "documents"), "doc_id", "text")
    val ph = Multimodal.perceptualHash(media).cache()
    try {
      val docPairs = Multimodal.phashPairs(ph, maxHamming = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // expansion = membership join over distinct-hash pairs (cross-hash)
      //           ∪ within-group pairs of each exact-equal hash (hamming 0)
      val dp = Multimodal.phashPairsDistinct(ph, maxHamming = 6)
      val cross = dp
        .join(ph.select(col("doc_id").as("ida"), col("phash_hi").as("ha_hi"),
          col("phash_lo").as("ha_lo")), Seq("ha_hi", "ha_lo"))
        .join(ph.select(col("doc_id").as("idb"), col("phash_hi").as("hb_hi"),
          col("phash_lo").as("hb_lo")), Seq("hb_hi", "hb_lo"))
        .select(least(col("ida"), col("idb")).as("a"),
          greatest(col("ida"), col("idb")).as("b"), col("hamming"))
      val within = ph.as("x").join(ph.as("y"),
          col("x.phash_hi") === col("y.phash_hi") &&
            col("x.phash_lo") === col("y.phash_lo") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          lit(0L).as("hamming"))
      val expanded = cross.unionByName(within)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(docPairs.nonEmpty && expanded == docPairs)
    } finally ph.unpersist()
  }

  test("phashPairs on real PNGs: finds the near pair, drops the inverted one") {
    implicit val s = spark
    val near = png(64, 64) { (x, y) =>
      if (x == 0 && y == 0) 0xffffff
      else if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff
    }
    val media = Multimodal.toMedia(
      Seq((1L, checker(invert = false)), (2L, near), (3L, checker(invert = true)))
        .toDF("doc_id", "payload"),
      "doc_id", "payload")
    val pairs = Multimodal.phashPairs(Multimodal.perceptualHash(media), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1L)))
  }

  test("WAV round-trip: the real AudioSystem parser returns the constructed " +
      "PCM stream and header exactly") {
    // payload bytes 0..7 wrap over 64 samples: sample i = (i%8 - 128)*256
    val wav = Multimodal.encodePcmWav((0 until 8).map(_.toByte).toArray)
    // a real RIFF/WAVE container, not our bytes echoed back
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val f = Multimodal.wavFeatures(7L, wav)
    assert(f.sample_rate == 8000 && f.n_samples == 64L)
    val samples = (0 until 64).map(i => ((i % 8) - 128) * 256)
    assert(f.peak_abs == samples.map(s => math.abs(s).toLong).max)
    assert(f.sum_sq == samples.map(s => s.toLong * s.toLong).sum)
    // all samples negative -> no strict sign change anywhere
    assert(f.zero_crossings == 0L)
  }

  test("WAV features count strict sign-change zero crossings") {
    // alternate above/below 128 -> every adjacent pair flips sign
    val wav = Multimodal.encodePcmWav(Array[Byte](100.toByte, 200.toByte))
    val f = Multimodal.wavFeatures(1L, wav)
    assert(f.zero_crossings == 63L)
    assert(f.peak_abs == math.abs((200 - 128) * 256).toLong.max(
      math.abs((100 - 128) * 256).toLong))
  }

  test("wavFeatures refuses formats it would mis-read") {
    val junk = Array.fill[Byte](32)(3)
    intercept[Exception](Multimodal.wavFeatures(1L, junk))
  }
}
