package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2 #38).
  *
  * Media (image/audio/video) are opaque `binary` columns with typed
  * metadata, processed in bounded per-partition batches. Image decode is
  * REAL — JDK `javax.imageio` JPEG/PNG → luminance thumbnail
  * ([[decodeImage]]). Audio decode is REAL — JDK `javax.sound.sampled`
  * WAV/PCM → sample rate, duration, amplitude features ([[decodeAudio]]).
  * Video decode is REAL for MJPEG-in-AVI — a RIFF container walk
  * ([[decodeVideo]]) that demuxes `00dc` frame chunks and decodes each as
  * a JPEG; no JDK demuxer exists for inter-frame codecs (mp4/h264 etc.),
  * so THOSE containers fall back to the clearly-marked deterministic STUB
  * ([[stubDecode]]) — the Spark-side contract (schema, partitioning, batch
  * shape, iterator-to-iterator processing) is identical either way, and a
  * production deployment swaps in a JNI/FFmpeg-backed [[FrameDecoder]]
  * (one [[frameDecoders]] registry entry) without touching the plumbing.
  */
object Multimodal {

  /** Canonical media row schema: id, modality, payload, typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType)
    )), nullable = true)
  ))

  final case class MediaFeature(media_id: Long, modality: String, n_bytes: Int, feature: Array[Float])

  /** REAL image decode via the JDK's `javax.imageio` (JPEG/PNG/GIF/BMP —
    * no external codec libraries needed): payload bytes → (width, height,
    * row-major luminance grid in [0,1]). Returns None when the bytes are
    * not a decodable image, so callers can fall back to [[stubDecode]].
    * Runs entirely inside an executor task — no driver involvement. */
  /** ImageIO's default ImageInputStream cache is DISK-backed: every
    * read/write call materializes a temp file, which at a 100k-frame MJPEG
    * pass means 100k file creations of pure overhead (the sources here are
    * in-memory byte arrays — a disk cache buys nothing). Switched to the
    * memory cache ONCE, lazily, before the first codec call. */
  private lazy val imageIoMemCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Per-thread, per-format reader reuse. `ImageIO.read`'s convenience path
    * walks the synchronized IIORegistry/ServiceRegistry on EVERY call —
    * at 32 decode threads that lock is the bottleneck, not the codec (r15
    * media_video profile: stage runSum 67.7 s vs cpuSum 18.5 s — tasks
    * blocked 3.7× their CPU). One reader per (thread, format), wired once
    * from the registry, then driven directly via setInput per image — same
    * plugin, same bytes out, no shared lock on the hot path. */
  private val threadReaders =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() = new java.util.HashMap[String, javax.imageio.ImageReader]()
    }

  /** Magic-byte format sniff for the two formats the JDK fully decodes;
    * anything else (or a sniff miss) falls back to `ImageIO.read`. */
  private def sniffFormat(payload: Array[Byte]): String =
    if (payload.length >= 3 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
    else if (payload.length >= 8 && payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else null

  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val fmt = sniffFormat(payload)
    if (fmt == null)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    else {
      val cache = threadReaders.get()
      var reader = cache.get(fmt)
      if (reader == null) {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (!it.hasNext) return javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        reader = it.next()
        cache.put(fmt, reader)
      }
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fast =
        try {
          reader.setInput(iis, true, true)
          Some(reader.read(0))
        } catch {
          // The pinned reader is the FIRST registry plugin for the sniffed
          // format; payloads it rejects (e.g. CMYK JPEG under the JDK
          // plugin) may still decode through ImageIO.read's stream-based
          // dispatch, which consults EVERY registered reader. Discard the
          // possibly-wedged reader (fresh one next call) and fall back —
          // the slow path only pays the registry walk on payloads the fast
          // path cannot decode at all.
          case _: Exception =>
            cache.remove(fmt)
            try reader.dispose() catch { case _: Exception => () }
            None
        } finally {
          // release the input so the reader holds no reference between
          // calls; the reader object itself is reused (dispose() kills it,
          // so only the failure branch above does that). setInput on a
          // DISPOSED reader (the failure branch) throws IllegalState —
          // caught separately so the stream close below still runs (one
          // swallowed-throw-skips-close leaked an input stream per
          // rejected payload).
          try reader.setInput(null) catch { case _: Exception => () }
          try iis.close() catch { case _: Exception => () }
        }
      fast.getOrElse(
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    }
  }

  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      imageIoMemCache
      val img = readImage(payload)
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val grid = new Array[Float](w * h)
        // Fast path: TYPE_3BYTE_BGR (what the JPEG plugin yields for color
        // images) exposes raw sRGB bytes via the raster's DataBufferByte —
        // identical channel values to getRGB without its per-pixel
        // ColorModel call. Luma math is byte-for-byte the same expression.
        // Other types (notably TYPE_BYTE_GRAY, whose getRGB applies a real
        // gray→sRGB colorspace conversion that raw raster bytes would skip)
        // keep the exact getRGB path — MultimodalSpec pins equality.
        //
        // Both fast paths index the data array as a TIGHTLY PACKED grid —
        // that is a LAYOUT property, not a type property: a subimage view
        // or a plugin that pads scanlines keeps the image type but shifts
        // every row (silently sheared luminance). tightlyPacked verifies
        // stride/offset/translation; any other layout takes the exact
        // getRGB path below.
        def tightlyPacked(comps: Int): Boolean = {
          val r = img.getRaster
          r.getSampleModel match {
            case sm: java.awt.image.ComponentSampleModel =>
              sm.getScanlineStride == w * comps && sm.getPixelStride == comps &&
                r.getDataBuffer.getOffset == 0 && r.getDataBuffer.getNumBanks == 1 &&
                r.getSampleModelTranslateX == 0 && r.getSampleModelTranslateY == 0
            case _ => false
          }
        }
        if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
            img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
            tightlyPacked(3)) {
          val data = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
          var i = 0
          var p = 0
          val n = w * h
          while (i < n) {
            val b = data(p) & 0xff; val g = data(p + 1) & 0xff; val r = data(p + 2) & 0xff
            grid(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
            i += 1; p += 3
          }
        } else if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY &&
            img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
            img.getRaster.getNumDataElements == 1 && tightlyPacked(1)) {
          // TYPE_BYTE_GRAY's getRGB is NOT identity — it routes every pixel
          // through the gray→sRGB ICC colorspace transform (native LCMS,
          // globally synchronized: the r15 media_video profile showed decode
          // tasks blocked ~3× their CPU on exactly this). The mapping is a
          // pure function of the 8-bit gray value, so build a 256-entry luma
          // LUT through the image's OWN ColorModel (bit-identical to
          // per-pixel getRGB — getRGB(x,y) IS colorModel.getRGB(dataElements),
          // MultimodalSpec pins equality) and stream the raster through it.
          val cm = img.getColorModel
          val lut = new Array[Float](256)
          val px = new Array[Byte](1)
          var v = 0
          while (v < 256) {
            px(0) = v.toByte
            val rgb = cm.getRGB(px)
            lut(v) = (0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255.0f
            v += 1
          }
          val data = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
          var i = 0
          val n = w * h
          while (i < n) {
            grid(i) = lut(data(i) & 0xff)
            i += 1
          }
        } else {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              // ITU-R BT.601 luma from sRGB bytes, normalized to [0,1].
              val lum = 0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
              grid(y * w + x) = lum / 255.0f
              x += 1
            }
            y += 1
          }
        }
        Some((w, h, grid))
      }
    } catch { case _: Exception => None }

  /** Feature dimension for decoded images: an 8×8 luminance thumbnail. */
  val ImageFeatureDim: Int = 64

  /** Decoded audio. Channel semantics, fixed by definition (not by the
    * mono-only test data): `nSamples` and `durationMs` are FRAME-denominated
    * (one frame = one sample instant across all channels — what "duration"
    * means regardless of channel count), while `ampSum` and `feature` are
    * CHANNEL-POOLED — SUM |sample| / mean-|amplitude| over the full
    * interleaved 16-bit PCM stream, i.e. every channel's samples contribute
    * equally. For mono the two denominations coincide; for stereo,
    * ampSum covers 2·nSamples values (an exact integer either way —
    * cross-engine checkable). Pooling (vs per-channel vectors) is the
    * loudness statistic a corpus-quality filter wants and keeps the schema
    * channel-count-independent. */
  final case class AudioDecoded(
      sampleRate: Int, nSamples: Long, durationMs: Long, ampSum: Long, feature: Array[Float])

  /** The JDK's registered audio container parsers, resolved ONCE.
    * `AudioSystem.getAudioInputStream` re-resolves providers through a
    * STATIC SYNCHRONIZED registry on every call, which serializes
    * concurrent decode across all executor threads (measured: linear-in-n
    * wall time on a 32-core local run). Loading the same SPI through the
    * public ServiceLoader keeps the identical parsers and semantics while
    * dropping the global lock from the per-row hot path. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // WAV readers first: a non-matching reader signals rejection by
    // THROWING UnsupportedAudioFileException, and two exception
    // constructions per payload dominate the whole container parse
    // (measured ~5x the open+read cost). For the dominant WAV case the
    // first probe now succeeds; other containers still fall through.
    b.result().sortBy(r => if (r.getClass.getName.contains("Wave")) 0 else 1)
  }

  private def openAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val rs = audioReaders
    if (rs.isEmpty) // no SPI visible (exotic runtime): fall back to the registry
      return javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
    var i = 0
    while (i < rs.length) {
      try return rs(i).getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException("no reader matched")
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/PCM — no
    * external codec libraries): parses the RIFF/WAVE container, converts to
    * 16-bit signed little-endian PCM if needed, and reduces the sample
    * stream to [[AudioDecoded]]. Returns None when the bytes are not a
    * parseable audio stream, so callers can fall back to [[stubDecode]].
    * Runs entirely inside an executor task. */
  def decodeAudio(payload: Array[Byte], dim: Int = 8): Option[AudioDecoded] =
    try {
      val in = openAudio(payload)
      try {
        val src = in.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, 2 * src.getChannels, src.getSampleRate, false)
        val st =
          if (src.matches(pcm)) in
          else javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, in)
        // The binning needs the TOTAL sample count up front (bin = i·dim/n),
        // which the PCM stream's frame length gives without materializing
        // the stream: readAllBytes held the whole converted clip NEXT TO the
        // payload bytes — 2× (or more, after upconversion) peak memory per
        // row, an executor-OOM class on hour-long clips. A fixed 64 KiB
        // window now streams the reduction; only an unspecified frame
        // length (not produced by the WAV paths this decoder claims) falls
        // back to full materialization.
        val frameBytes = 2 * src.getChannels
        val declaredFrames = st.getFrameLength
        val (n, reader: java.io.InputStream, fallbackBytes) =
          if (declaredFrames > 0 && declaredFrames <= Long.MaxValue / frameBytes / 2)
            ((declaredFrames * frameBytes / 2).min(Int.MaxValue.toLong).toInt, st, null)
          else {
            val all = st.readAllBytes()
            (all.length / 2, null, all)
          }
        if (n == 0) None
        else {
          val feature = new Array[Float](dim)
          val counts = new Array[Int](dim)
          var ampSum = 0L
          var i = 0L
          def sample(lo: Int, hi: Byte): Unit = {
            val s = (hi.toInt << 8) | lo
            val a = math.abs(s)
            val bin = (i * dim / n).toInt
            feature(bin) += a / 32768.0f
            counts(bin) += 1
            ampSum += a
            i += 1
          }
          if (reader != null) {
            val buf = new Array[Byte](1 << 16)
            var carry = -1 // low byte whose high byte is in the next read
            var read = reader.read(buf)
            while (read > 0 && i < n) {
              var j = 0
              if (carry >= 0) { sample(carry, buf(0)); j = 1; carry = -1 }
              while (j + 1 < read && i < n) { sample(buf(j) & 0xff, buf(j + 1)); j += 2 }
              if (j < read && i < n) carry = buf(j) & 0xff
              read = reader.read(buf)
            }
            // a stream shorter than its declared frame length is a corrupt
            // container — refuse (None → stub) rather than emit bins whose
            // denominators lie
            if (i != n) return None
          } else {
            val bytes = fallbackBytes
            var p = 0
            while (p + 1 < bytes.length) { sample(bytes(p) & 0xff, bytes(p + 1)); p += 2 }
          }
          var b = 0
          while (b < dim) {
            if (counts(b) > 0) feature(b) /= counts(b)
            b += 1
          }
          val rate = src.getSampleRate.toInt
          val frames = n.toLong / src.getChannels
          Some(AudioDecoded(rate, frames, frames * 1000L / rate, ampSum, feature))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Minimal RIFF/WAVE writer: 16-bit signed little-endian PCM, `channels`
    * interleaved (samples.length must be a multiple of `channels`). Used
    * by tests and the deterministic media synthesis in [[graft.queries
    * .MediaOps]] — the payloads it produces exercise the REAL
    * [[decodeAudio]] path, including the stereo frame/pooled-amplitude
    * semantics documented on [[AudioDecoded]]. */
  def wavPcm16(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"${samples.length} samples not a whole number of $channels-channel frames")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort) // PCM
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2 * channels) // byte rate
    bb.putShort((2 * channels).toShort); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** One demuxed-and-decoded video frame: JPEG-decoded dimensions plus the
    * mean of the frame's luminance grid (in [0,1]). */
  final case class VideoFrame(width: Int, height: Int, meanLum: Float)

  /** Decoded video: container-header metadata (avih width/height/frame
    * timing) plus the per-frame decode results from the `movi` stream.
    * `nFrames` counts the ACTUAL demuxed frame chunks, not the header's
    * claim — the two are cross-checked by tests and the `media_video`
    * oracle. `durationMs` = nFrames · microSecPerFrame / 1000. */
  final case class VideoDecoded(
      width: Int, height: Int, microSecPerFrame: Long, headerFrames: Long,
      nFrames: Int, durationMs: Long, frames: IndexedSeq[VideoFrame])

  /** Registered video decoders, tried in order by [[decodeVideo]]. The
    * prepend-an-impl story, exercised for real: [[FfmpegCliDecoder]] leads
    * and claims mp4-family (`ftyp`) containers — but ONLY on hosts where
    * the ffmpeg/ffprobe binaries resolve, so a JDK-only deployment sees
    * bit-identical dispatch (AVI → [[MjpegAviDecoder]], mp4 → no claimant
    * → [[stubDecode]] fallback). The claims are container-disjoint (ftyp
    * vs RIFF/AVI), so registration order is observability, not
    * precedence. */
  val frameDecoders: Seq[FrameDecoder] = Seq(FfmpegCliDecoder, MjpegAviDecoder)

  /** REAL video decode via the first registered [[FrameDecoder]] that
    * claims the container (magic-byte sniff, cheap). Returns None when no
    * decoder claims the bytes (e.g. mp4/h264 on the JDK-only build) or the
    * claimed stream doesn't fully decode, so callers can fall back to
    * [[stubDecode]]. Runs entirely inside an executor task. */
  def decodeVideo(payload: Array[Byte],
      decoders: Seq[FrameDecoder] = frameDecoders): Option[VideoDecoded] =
    // EVERY claiming decoder gets a shot, in registration order — a decoder
    // that claims the container but fails to decode (truncated stream, an
    // unsupported profile of a shared fourcc) must not shadow a later
    // registered decoder with overlapping claims. collectFirst would stop
    // at the first claimant, breaking the prepend-a-better-impl contract.
    decoders.iterator
      .filter(_.claims(payload))
      .map(d => d.decode(payload))
      .collectFirst { case Some(v) => v }

  /** Minimal AVI/MJPEG writer (the video analogue of [[wavPcm16]]):
    * RIFF(AVI ) { LIST(hdrl){ avih, LIST(strl){ strh 'vids'/'MJPG', strf
    * BITMAPINFOHEADER } }, LIST(movi){ 00dc <jpeg> ... } }. Used by tests
    * and the deterministic media synthesis in [[graft.queries.MediaOps]] —
    * payloads it produces exercise the REAL [[decodeVideo]] path. */
  def aviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
      microSecPerFrame: Long = 100000L): Array[Byte] = {
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    def u32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).order(bo).putInt((v & 0xffffffffL).toInt).array()
    def u16(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(2).order(bo).putShort(v.toShort).array()
    def fcc(s: String): Array[Byte] = { require(s.length == 4); s.getBytes("US-ASCII") }
    def chunk(fc: String, data: Array[Byte]): Array[Byte] =
      fcc(fc) ++ u32(data.length.toLong) ++ data ++
        (if ((data.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(tpe: String, data: Array[Byte]): Array[Byte] = chunk("LIST", fcc(tpe) ++ data)
    val fps = math.max(1L, 1000000L / math.max(1L, microSecPerFrame))
    val avih = Array.concat(
      u32(microSecPerFrame), u32(0), u32(0), u32(0),
      u32(frames.length.toLong), u32(0), u32(1), u32(0),
      u32(width.toLong), u32(height.toLong), u32(0), u32(0), u32(0), u32(0))
    val strh = Array.concat(
      fcc("vids"), fcc("MJPG"), u32(0), u16(0), u16(0), u32(0),
      u32(1), u32(fps), u32(0), u32(frames.length.toLong), u32(0), u32(0), u32(0),
      u16(0), u16(0), u16(width), u16(height))
    val strf = Array.concat(
      u32(40), u32(width.toLong), u32(height.toLong), u16(1), u16(24), fcc("MJPG"),
      u32(width.toLong * height * 3), u32(0), u32(0), u32(0), u32(0))
    val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ u32(body.length.toLong) ++ body
  }

  /** Deterministic solid-gray JPEG (level 0-255) — the per-frame payload
    * for synthesized MJPEG test videos. Dimensions survive JPEG exactly;
    * the gray level survives approximately (DC quantization), so tests
    * compare luminance with tolerance while the oracle checks geometry. */
  def jpegGray(gray: Int, w: Int, h: Int): Array[Byte] = {
    imageIoMemCache
    // sRGB RGB image, NOT TYPE_BYTE_GRAY: the JDK's byte-gray type lives in
    // a LINEAR gray color space, so encoders apply a linear->sRGB transfer
    // that turns gray 40 into ~110. An sRGB fill round-trips to ~the same
    // value (within JPEG DC quantization).
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray & 0xff) * 0x010101
    img.setRGB(0, 0, w, h, Array.fill(w * h)(rgb), 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "jpg", bos)) sys.error("no JPEG writer registered")
    bos.toByteArray
  }

  /** STUB decode: a real implementation decodes the payload with a codec and
    * emits a feature vector (resized pixels, mel spectrogram, sampled
    * frames). Here: a deterministic 8-dim fingerprint of the bytes, so the
    * distributed plumbing is fully exercisable without codec libraries. */
  def stubDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Per-partition feature extraction: iterator-to-iterator (never
    * materializes a partition), the Scala analogue of a Pandas-UDF
    * `mapInPandas` pipeline. Rows stream ONE at a time: the decoders here
    * are per-row, so an `it.grouped(batchSize)` stage (the earlier shape)
    * held `batchSize` full payloads in memory per group for identical
    * output — 64 × a 100 MB video is 6.4 GB of peak payload footprint per
    * task bought by a batch boundary nothing consumed. A real vectorized
    * codec / model-inference step would re-introduce batching AT ITS OWN
    * boundary (ids + decoded features, not raw payloads); `batchSize` is
    * retained as that future boundary's knob. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
            val bytes = Option(payload).getOrElse(Array.emptyByteArray)
            // Images, WAV audio and MJPEG/AVI video get a REAL decode
            // (javax.imageio → 8×8 luminance thumbnail; javax.sound.sampled
            // → temporal mean-|amplitude| bins; RIFF walk + per-frame JPEG
            // → temporal mean-luminance bins); other containers and
            // undecodable bytes fall back to the stub fingerprint.
            val feature = modality match {
              case "image" => decodeImage(bytes) match {
                case Some((w, h, grid)) => resizeStub(grid, w, h, 8, 8)
                case None               => stubDecode(bytes)
              }
              case "audio" => decodeAudio(bytes) match {
                case Some(d) => d.feature
                case None    => stubDecode(bytes)
              }
              case "video" => decodeVideo(bytes) match {
                case Some(v) if v.frames.nonEmpty =>
                  // Temporal binning mirrors the audio feature: frame i of
                  // n lands in bin i*dim/n; each bin holds its mean lum.
                  val dim = 8
                  val out = new Array[Float](dim)
                  val counts = new Array[Int](dim)
                  var i = 0
                  while (i < v.frames.length) {
                    val bin = (i.toLong * dim / v.frames.length).toInt
                    out(bin) += v.frames(i).meanLum
                    counts(bin) += 1
                    i += 1
                  }
                  var b = 0
                  while (b < dim) { if (counts(b) > 0) out(b) /= counts(b); b += 1 }
                  out
                case _ => stubDecode(bytes)
              }
              case _ => stubDecode(bytes)
            }
            MediaFeature(id, modality, bytes.length, feature)
        }
      }
  }

  final case class Frame(media_id: Long, frame_idx: Int, n_bytes: Int, feature: Array[Float])

  /** STUB resize: nearest-neighbor downsample of a decoded feature grid. A
    * real implementation calls libvips/opencv on pixel data; the selection
    * arithmetic (the Spark-relevant part: deterministic, shape-preserving,
    * per-row) is real. */
  def resizeStub(grid: Array[Float], srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Float] = {
    require(grid.length == srcW * srcH, s"grid ${grid.length} != ${srcW}x$srcH")
    val out = new Array[Float](dstW * dstH)
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        out(y * dstW + x) = grid((y * srcH / dstH) * srcW + (x * srcW / dstW))
        x += 1
      }
      y += 1
    }
    out
  }

  /** STUB frame sampling: split a video payload into `nFrames` evenly spaced
    * byte windows and feature-extract each — one output row per frame
    * (media_id, frame_idx, feature). A real implementation seeks keyframes
    * with a demuxer; the Spark-side fan-out (flatMap, one row per sampled
    * frame, no shuffle) is the production shape. */
  def sampleFrames(media: DataFrame, nFrames: Int, featureDim: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("modality") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = Option(payload).getOrElse(Array.emptyByteArray)
        val window = math.max(1, bytes.length / math.max(1, nFrames))
        (0 until nFrames).iterator.map { i =>
          val start = math.min(i * window, math.max(0, bytes.length - 1))
          val frame = bytes.slice(start, math.min(start + window, bytes.length))
          Frame(id, i, frame.length, stubDecode(frame, featureDim))
        }
      }
  }

  /** Magic-byte modality sniffing as a codegen'd column expression (no UDF):
    * jpeg ff d8 ff, png 89 50 4e 47, RIFF + form type (WAVE → wav,
    * 'AVI ' → avi), mp4 ftyp box. RIFF alone is NOT wav: the container is
    * shared — this module's own MJPEG/AVI videos are RIFF files, and
    * classifying them audio/wav routed them down the audio path where the
    * decode fails and the modality label lies. The form type at bytes 9–12
    * disambiguates. */
  def sniffModality(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head4 = hex(substring(payload, 1, 4))
    val form = hex(substring(payload, 9, 4))
    val ftyp = hex(substring(payload, 5, 4))
    when(head4.startsWith("FFD8FF"), "image/jpeg")
      .when(head4 === "89504E47", "image/png")
      .when(head4 === "52494646" && form === "57415645", "audio/wav")
      .when(head4 === "52494646" && form === "41564920", "video/avi")
      .when(ftyp === "66747970", "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Deterministic synthetic media table for tests/benches (no codecs in the
    * environment ⇒ payloads are generated bytes with real magic headers). */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 4): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .map { i =>
        val modality = (i % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val header: Array[Byte] = (i % 3) match {
          case 0 => Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
          // full RIFF preamble incl. the WAVE form type the sniffer requires
          case 1 => "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes
          case _ => Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes
        }
        val body = Array.tabulate[Byte](64)(j => ((i * 31 + j * 7) % 251).toByte)
        (i, modality, header ++ body, (64, 64, 16000, 1000L))
      }
      .toDF("media_id", "modality", "payload", "m")
      .select(
        col("media_id"), col("modality"), col("payload"),
        struct(
          col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("duration_ms")).as("meta"))
  }
}
