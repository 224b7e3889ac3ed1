package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media matches the canonical schema") {
    val media = Multimodal.syntheticMedia(spark, 12, partitions = 3)
    // name/type layout must match the canonical schema (nullability flags
    // differ through toDF and don't affect the storage contract)
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.rdd.getNumPartitions == 3)
    assert(media.count() == 12)
  }

  test("extractFeatures is deterministic, typed, and partition-preserving") {
    val media = Multimodal.syntheticMedia(spark, 20, partitions = 4)
    val f1 = Multimodal.extractFeatures(media, batchSize = 8)
    assert(f1.rdd.getNumPartitions == 4) // iterator-to-iterator, no shuffle
    val rows = f1.collect().sortBy(_.media_id)
    assert(rows.length == 20)
    // 4-byte jpeg magic + 64 body; mp4 carries an 8-byte ftyp box; wav a
    // full 12-byte RIFF/WAVE preamble
    assert(rows.forall(r => r.n_bytes == 68 || r.n_bytes == 72 || r.n_bytes == 76))
    assert(rows.forall(_.feature.length == 8))
    val rows2 = Multimodal.extractFeatures(media, batchSize = 3).collect().sortBy(_.media_id)
    assert(rows.zip(rows2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("extractFeatures REALLY decodes generated JPEG/PNG images via javax.imageio") {
    def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // 16x16 solid mid-gray -> every luminance sample is exactly 128/255.
    val gray = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = gray.createGraphics(); g2.setColor(new java.awt.Color(128, 128, 128)); g2.fillRect(0, 0, 16, 16); g2.dispose()
    // 16x16 horizontal black->white ramp: left thumbnail cells darker than right.
    val ramp = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) { val v = x * 17; ramp.setRGB(x, y, new java.awt.Color(v, v, v).getRGB) }

    val media = Seq(
      (1L, "image", encode(gray, "png")),
      (2L, "image", encode(gray, "jpg")),
      (3L, "image", encode(ramp, "png")),
      (4L, "audio", Array[Byte](1, 2, 3)) // non-image: stub fallback, 8-dim
    ).toDF("media_id", "modality", "payload")

    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.length == Multimodal.ImageFeatureDim)
    assert(feats(1L).feature.forall(v => math.abs(v - 128f / 255f) < 1e-6), "png gray decodes exactly")
    assert(feats(2L).feature.forall(v => math.abs(v - 128f / 255f) < 0.05), "jpeg gray decodes approximately")
    val r = feats(3L).feature
    assert(r.length == 64 && r(0) < r(7) && r(56) < r(63), "ramp thumbnail preserves left-to-right gradient")
    assert(feats(4L).feature.length == 8, "non-image stays on the stub path")
    // direct decode roundtrip: dimensions survive
    val Some((w, h, grid)) = Multimodal.decodeImage(encode(ramp, "png"))
    assert(w == 16 && h == 16 && grid.length == 256)
    assert(Multimodal.decodeImage(Array[Byte](0x42, 0x42)).isEmpty, "garbage bytes -> None, not a throw")
  }

  test("decodeAudio REALLY parses RIFF/WAVE PCM16 via javax.sound.sampled") {
    val rate = 8000
    val samples = Array.tabulate[Short](400)(i => (((i * 7) % 251) - 125).toShort)
    val wav = Multimodal.wavPcm16(samples, rate)
    // genuine container: magic bytes sniff as wav
    assert(wav.take(4).sameElements("RIFF".getBytes("US-ASCII")))
    val d = Multimodal.decodeAudio(wav).get
    assert(d.sampleRate == rate)
    assert(d.nSamples == 400L)
    assert(d.durationMs == 400L * 1000 / rate)
    assert(d.ampSum == samples.map(s => math.abs(s.toLong)).sum)
    assert(d.feature.length == 8 && d.feature.forall(f => f >= 0f && f <= 1f))
    // non-audio bytes are rejected, not misparsed
    assert(Multimodal.decodeAudio(Array.fill[Byte](64)(42)).isEmpty)
  }

  test("decodeAudio stereo: frame-denominated nSamples, channel-pooled ampSum") {
    val rate = 8000
    // 200 frames x 2 channels, L and R deliberately different amplitudes
    // so pooled-vs-per-channel confusion would change ampSum.
    val interleaved = Array.tabulate[Short](400)(i =>
      if (i % 2 == 0) 1000.toShort else (-250).toShort)
    val d = Multimodal.decodeAudio(Multimodal.wavPcm16(interleaved, rate, channels = 2)).get
    assert(d.sampleRate == rate)
    assert(d.nSamples == 200L, "frames, not interleaved samples")
    assert(d.durationMs == 200L * 1000 / rate)
    assert(d.ampSum == 200L * 1000 + 200L * 250, "both channels pooled")
    assert(d.feature.length == 8 && d.feature.forall(f => f >= 0f && f <= 1f))
  }

  test("decodeVideo REALLY demuxes MJPEG-in-AVI: RIFF walk + per-frame JPEG decode") {
    val grays = Seq(40, 200, 120)
    val frames = grays.map(g => Multimodal.jpegGray(g, 12, 10))
    val avi = Multimodal.aviMjpeg(frames, 12, 10, microSecPerFrame = 100000L)
    // genuine container: magic bytes
    assert(avi.take(4).sameElements("RIFF".getBytes("US-ASCII")))
    assert(avi.slice(8, 12).sameElements("AVI ".getBytes("US-ASCII")))
    val d = Multimodal.decodeVideo(avi).get
    assert(d.width == 12 && d.height == 10, "avih geometry")
    assert(d.nFrames == 3 && d.headerFrames == 3L, "movi chunk count == header claim")
    assert(d.microSecPerFrame == 100000L)
    assert(d.durationMs == 300L)
    assert(d.frames.forall(f => f.width == 12 && f.height == 10), "decoded JPEG dims")
    // JPEG DC quantization shifts solid grays slightly — compare with
    // tolerance; the ORDERING dark < mid < bright must survive exactly.
    val lums = d.frames.map(_.meanLum)
    grays.zip(lums).foreach { case (g, l) => assert(math.abs(l - g / 255f) < 0.04f, s"$g -> $l") }
    assert(lums(0) < lums(2) && lums(2) < lums(1))
    // an odd-length frame chunk exercises the RIFF even-padding rule: the
    // chunk after it only parses if both writer and walker pad correctly.
    // (A trailing byte after the JPEG EOI marker is ignored by the decoder.)
    val oddJpeg = if (frames.head.length % 2 == 0) frames.head :+ 0x00.toByte else frames.head
    assert(oddJpeg.length % 2 == 1)
    val odd = Multimodal.decodeVideo(Multimodal.aviMjpeg(Seq(oddJpeg, frames(1)), 12, 10)).get
    assert(odd.nFrames == 2 && odd.frames.forall(f => f.width == 12 && f.height == 10))
    // non-AVI bytes are rejected, not misparsed
    assert(Multimodal.decodeVideo(Array.fill[Byte](64)(42)).isEmpty)
    // an mp4-ftyp payload (no JDK demuxer) is rejected -> stub fallback path
    assert(Multimodal.decodeVideo(Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes ++ Array.fill[Byte](32)(7)).isEmpty)
    // an AVI whose frame chunks aren't JPEGs is not silently half-decoded
    val badFrames = Multimodal.aviMjpeg(Seq(Array.fill[Byte](16)(1)), 12, 10)
    assert(Multimodal.decodeVideo(badFrames).isEmpty)
  }

  test("FrameDecoder seam: a registered codec impl takes mp4 without plumbing changes") {
    import graft.multimodal.{FrameDecoder, MjpegAviDecoder}
    // The documented FFmpeg/JNI swap point as a TYPE: an mp4-claiming
    // decoder prepended to the registry picks up ftyp payloads while AVI
    // still routes to the MJPEG impl — and claims-order dispatch means the
    // fake never sees containers it didn't claim.
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes("US-ASCII") ++ Array.fill[Byte](32)(7)
    object FakeMp4Decoder extends FrameDecoder {
      override def claims(p: Array[Byte]): Boolean =
        p.length >= 8 && new String(p, 4, 4, "US-ASCII") == "ftyp"
      override def decode(p: Array[Byte]): Option[Multimodal.VideoDecoded] =
        Some(Multimodal.VideoDecoded(16, 16, 40000L, 1L, 1, 40L,
          IndexedSeq(Multimodal.VideoFrame(16, 16, 0.5f))))
    }
    val registry = Seq(FakeMp4Decoder, MjpegAviDecoder)
    assert(Multimodal.decodeVideo(mp4, registry).exists(_.nFrames == 1))
    val avi = Multimodal.aviMjpeg(Seq(Multimodal.jpegGray(90, 8, 8)), 8, 8)
    assert(Multimodal.decodeVideo(avi, registry).exists(d => d.width == 8 && d.nFrames == 1))
    // default registry (JDK-only): mp4 stays undecodable -> stub fallback
    assert(Multimodal.decodeVideo(mp4).isEmpty)
    assert(!MjpegAviDecoder.claims(mp4) && MjpegAviDecoder.claims(avi))
  }

  test("decodeImage raster fast path is bit-identical to the getRGB path on color JPEGs") {
    // The r15 TYPE_3BYTE_BGR fast path reads raw raster bytes instead of
    // per-pixel getRGB; the luma floats must match getRGB's EXACTLY (the
    // media oracles hash these values).
    val src = new java.awt.image.BufferedImage(17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 17)
      src.setRGB(x, y, ((x * 15) << 16) | ((y * 28) << 8) | ((x * y * 7) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val payload = bos.toByteArray
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(ref.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
      s"precondition: color JPEG decodes to 3BYTE_BGR, got type ${ref.getType}")
    val Some((w, h, grid)) = Multimodal.decodeImage(payload)
    assert((w, h) == (17, 9))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val lum = 0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
      assert(grid(y * w + x) == lum / 255.0f, s"pixel ($x,$y) diverged")
    }
    // reader reuse across calls on the same thread must stay correct
    assert(Multimodal.decodeImage(payload).get._3.toSeq == grid.toSeq)
  }

  test("decodeImage gray LUT path is bit-identical to per-pixel getRGB") {
    // TYPE_BYTE_GRAY getRGB applies a real gray->sRGB ICC transform; the
    // r15 LUT fast path must reproduce it EXACTLY for all 256 gray values
    // (media oracles hash these floats). A width x height covering every
    // byte value exercises the whole table.
    // PNG preserves TYPE_BYTE_GRAY end-to-end (the corpus JPEGs re-decode
    // as 3BYTE_BGR and take the color fast path instead); every byte value
    // 0..255 appears so the whole LUT is exercised.
    val src = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      src.getRaster.setSample(x, y, 0, y * 16 + x)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "png", bos))
    val payload = bos.toByteArray
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(ref.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
      s"precondition: gray PNG decodes to TYPE_BYTE_GRAY, got ${ref.getType}")
    val Some((w, h, grid)) = Multimodal.decodeImage(payload)
    assert((w, h) == (16, 16))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val lum = 0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
      assert(grid(y * w + x) == lum / 255.0f, s"pixel ($x,$y) diverged")
    }
  }

  test("FrameDecoder dispatch: a claiming-but-failing decoder does not shadow later claimants") {
    import graft.multimodal.{FrameDecoder, MjpegAviDecoder}
    // Overlapping claims: a decoder that claims the AVI container but
    // cannot decode the stream (None) must yield to the next claimant in
    // registration order — the contract that makes "prepend a broader but
    // partial impl" safe. A non-claiming decoder must never be ASKED.
    var brokenAsked = 0
    var strangerAsked = 0
    object BrokenAviDecoder extends FrameDecoder {
      override def claims(p: Array[Byte]): Boolean = MjpegAviDecoder.claims(p)
      override def decode(p: Array[Byte]): Option[Multimodal.VideoDecoded] = {
        brokenAsked += 1; None // claimed but undecodable
      }
    }
    object NeverClaims extends FrameDecoder {
      override def claims(p: Array[Byte]): Boolean = false
      override def decode(p: Array[Byte]): Option[Multimodal.VideoDecoded] = {
        strangerAsked += 1; Some(Multimodal.VideoDecoded(1, 1, 0L, 1L, 1, 0L,
          IndexedSeq(Multimodal.VideoFrame(1, 1, 0f))))
      }
    }
    val avi = Multimodal.aviMjpeg(Seq(Multimodal.jpegGray(90, 8, 8)), 8, 8)
    val out = Multimodal.decodeVideo(avi, Seq(NeverClaims, BrokenAviDecoder, MjpegAviDecoder))
    assert(out.exists(d => d.width == 8 && d.nFrames == 1), "real decoder must win through the failing claimant")
    assert(brokenAsked == 1, "claiming decoder is asked exactly once")
    assert(strangerAsked == 0, "non-claiming decoder is never asked")
    // and when EVERY claimant fails, the result is the stub-fallback None
    assert(Multimodal.decodeVideo(avi, Seq(BrokenAviDecoder)).isEmpty)
  }

  test("FfmpegCliDecoder: claims gates on BOTH the ftyp signature and binary presence") {
    import graft.multimodal.FfmpegCliDecoder
    // a minimal mp4-family signature: size + 'ftyp' box header + brand
    val ftyp = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0)
    // signature match is necessary but not sufficient…
    assert(FfmpegCliDecoder.claims(ftyp) == FfmpegCliDecoder.available,
      "ftyp payload: claims must equal binary availability")
    // …and non-ftyp bytes are never claimed, binaries or not
    val avi = Multimodal.aviMjpeg(Seq(Multimodal.jpegGray(90, 8, 8)), 8, 8)
    assert(!FfmpegCliDecoder.claims(avi))
    assert(!FfmpegCliDecoder.claims(Array[Byte](1, 2, 3)))
    // on an FFmpeg-less host the registered dispatch must fall through to
    // the stub for mp4 payloads (decodeVideo None), exactly as pre-seam
    if (!FfmpegCliDecoder.available)
      assert(Multimodal.decodeVideo(ftyp).isEmpty, "no claimant -> stub fallback")
  }

  test("FfmpegCliDecoder decodes a real mp4 end-to-end (skipped when ffmpeg is absent)") {
    import graft.multimodal.FfmpegCliDecoder
    assume(FfmpegCliDecoder.available, "ffmpeg/ffprobe not on PATH — skipping the live decode")
    // generate a 1 s, 5 fps, 64x48 test clip with ffmpeg itself (lavfi
    // testsrc) — self-contained, no fixture files
    val tmp = java.io.File.createTempFile("graft_ffmpeg_spec_", ".mp4")
    try {
      val gen = new ProcessBuilder(
        "ffmpeg", "-v", "error", "-y", "-f", "lavfi",
        "-i", "testsrc=duration=1:rate=5:size=64x48",
        "-pix_fmt", "yuv420p", tmp.getAbsolutePath).inheritIO().start()
      assert(gen.waitFor() == 0, "test clip generation failed")
      val payload = java.nio.file.Files.readAllBytes(tmp.toPath)
      assert(FfmpegCliDecoder.claims(payload))
      val Some(v) = Multimodal.decodeVideo(payload) // through the registry
      assert(v.width == 64 && v.height == 48, s"${v.width}x${v.height}")
      assert(v.nFrames == 5, s"nFrames=${v.nFrames}")
      assert(v.microSecPerFrame == 200000L, s"uspf=${v.microSecPerFrame}")
      assert(v.durationMs == 1000L, s"durMs=${v.durationMs}")
      assert(v.frames.forall(f => f.meanLum >= 0f && f.meanLum <= 1f))
      // a truncated stream must claim-but-fail (None), not crash or lie
      assert(FfmpegCliDecoder.decode(payload.take(64)).isEmpty)
    } finally { tmp.delete(); () }
  }

  test("ffmpeg runner: a child that hangs producing NO output is killed by the watchdog") {
    import graft.multimodal.FfmpegCliDecoder
    // `sleep 60` writes nothing and keeps stdout open, so the read blocks
    // until the child exits or is killed — pre-watchdog this wedged the
    // task for the child's full lifetime (the post-read waitFor timeout
    // never ran). The watchdog must force-kill at ~timeoutSec.
    System.setProperty("graft.ffmpeg.timeoutSec", "2")
    try {
      val t0 = System.nanoTime()
      val ok = FfmpegCliDecoder.run(Seq("/bin/sh", "-c", "sleep 60"),
        in => { in.transferTo(java.io.OutputStream.nullOutputStream()); () })
      val secs = (System.nanoTime() - t0) / 1e9
      assert(!ok, "a killed child must fail the run")
      assert(secs < 30, s"watchdog must unblock the silent-child read, took $secs s")
    } finally { System.clearProperty("graft.ffmpeg.timeoutSec"); () }
  }

  test("ffmpeg runner: a SLOW child that keeps producing output outlives timeoutSec (no-progress semantics)") {
    import graft.multimodal.FfmpegCliDecoder
    // Emits a byte every second for 5 s — total wall exceeds timeoutSec=2
    // but no silence window does. A hard wall cap would kill it mid-stream
    // and silently degrade long legitimate decodes to the stub; the
    // no-progress watchdog must let it finish.
    System.setProperty("graft.ffmpeg.timeoutSec", "2")
    try {
      var total = 0L
      val ok = FfmpegCliDecoder.run(
        Seq("/bin/sh", "-c", "for i in 1 2 3 4 5; do printf x; sleep 1; done"),
        in => {
          val buf = new Array[Byte](16)
          var n = in.read(buf)
          while (n >= 0) { total += n; n = in.read(buf) }
        })
      assert(ok, "a progressing child must complete successfully")
      assert(total == 5L, s"all output must arrive, got $total bytes")
    } finally { System.clearProperty("graft.ffmpeg.timeoutSec"); () }
  }

  test("extractFeatures routes video through the real MJPEG/AVI decoder") {
    // 8 frames -> every one of the 8 temporal bins is populated
    val dark = Multimodal.aviMjpeg(Seq.fill(8)(Multimodal.jpegGray(10, 8, 8)), 8, 8)
    val bright = Multimodal.aviMjpeg(Seq.fill(8)(Multimodal.jpegGray(240, 8, 8)), 8, 8)
    val media = Seq(
      (1L, "video", dark),
      (2L, "video", bright)
    ).toDF("media_id", "modality", "payload")
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    // real decode: temporal mean-luminance bins — bright video strictly
    // above dark in every bin, values in [0,1] (the stub fingerprint is
    // byte-sum-scaled and would NOT preserve this containment).
    assert(feats.forall(_.feature.length == 8))
    feats.foreach(f => assert(f.feature.forall(v => v >= 0f && v <= 1f), f.feature.mkString(",")))
    (0 until 8).foreach { i => assert(feats(0).feature(i) < feats(1).feature(i)) }
    assert(feats(1).feature.forall(_ > 0.8f))
  }

  test("extractFeatures routes audio through the real WAV decoder") {
    val rate = 16000
    val loud = Multimodal.wavPcm16(Array.fill[Short](100)(20000), rate)
    val quiet = Multimodal.wavPcm16(Array.fill[Short](100)(100), rate)
    val media = Seq(
      (1L, "audio", loud, (0, 0, rate, 0L)),
      (2L, "audio", quiet, (0, 0, rate, 0L))
    ).toDF("media_id", "modality", "payload", "m")
      .select(col("media_id"), col("modality"), col("payload"))
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    // decoded amplitude separates loud from quiet — the stub fingerprint
    // (byte-sum over a fixed dim) would not track PCM amplitude this way
    assert(feats(0).feature.forall(f => math.abs(f - 20000f / 32768f) < 1e-3))
    assert(feats(1).feature.forall(f => math.abs(f - 100f / 32768f) < 1e-4))
  }

  test("resizeStub: deterministic nearest-neighbor shape change") {
    val grid = Array.tabulate(16)(_.toFloat) // 4x4
    val out = Multimodal.resizeStub(grid, 4, 4, 2, 2)
    assert(out.toSeq == Seq(0f, 2f, 8f, 10f))
    intercept[IllegalArgumentException](Multimodal.resizeStub(grid, 3, 3, 2, 2))
  }

  test("sampleFrames fans out one row per sampled video frame, no shuffle") {
    val media = Multimodal.syntheticMedia(spark, 12, partitions = 3)
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.rdd.getNumPartitions == 3)
    val rows = frames.collect()
    val videos = media.filter(col("modality") === "video").count()
    assert(rows.length == videos * 4)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3)))
    // deterministic across runs
    val rows2 = Multimodal.sampleFrames(media, nFrames = 4).collect()
    assert(rows.sortBy(r => (r.media_id, r.frame_idx)).zip(rows2.sortBy(r => (r.media_id, r.frame_idx)))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("sniffModality reads magic bytes as a column expression") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val got = media
      .select(col("modality"), Multimodal.sniffModality(col("payload")).as("mime"))
      .distinct().as[(String, String)].collect().toMap
    assert(got == Map(
      "image" -> "image/jpeg",
      "audio" -> "audio/wav",
      "video" -> "video/mp4"))
    // RIFF is a SHARED container: this module's own AVI videos must sniff
    // as video (the old first-4-bytes check sent them down the audio path),
    // and a RIFF with an unknown form type is neither
    val avi = Multimodal.aviMjpeg(Seq(Multimodal.jpegGray(90, 8, 8)), 8, 8)
    val bare = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "XXXX".getBytes ++ new Array[Byte](16)
    val sniffed = Seq(("avi", avi), ("bare", bare)).toDF("k", "payload")
      .select(col("k"), Multimodal.sniffModality(col("payload")).as("mime"))
      .as[(String, String)].collect().toMap
    assert(sniffed == Map("avi" -> "video/avi", "bare" -> "application/octet-stream"), sniffed)
  }
}
