package graft.multimodal

/** The video container/codec seam (SURVEY §2 #38 "video decode").
  *
  * A decoder owns BOTH halves of turning payload bytes into frames —
  * container demux and per-frame pixel decode — because inter-frame codecs
  * can't split them (a P-frame is undecodable without its reference).
  * Everything ABOVE this trait (schema, partitioning, batch shape,
  * iterator-to-iterator plumbing in [[Multimodal]] / MediaOps) is
  * decoder-agnostic: a production deployment adds an FFmpeg/JNI-backed
  * implementation for mp4/h264 to [[Multimodal.frameDecoders]] and no
  * Spark-side code changes.
  *
  * Contract:
  *  - `claims` is a cheap signature sniff (magic bytes only — no decode
  *    work): dispatch tries decoders in registration order and asks only
  *    those that claim the container to decode.
  *  - `decode` returns None for bytes it cannot FULLY decode (claimed
  *    container but undecodable stream) — callers fall back to
  *    [[Multimodal.stubDecode]], never crash the task.
  *  - Implementations must be Serializable and thread-safe: instances are
  *    closed over by executor tasks and shared across a task pool.
  */
trait FrameDecoder extends Serializable {
  /** Cheap container sniff — magic bytes only, no decode work. */
  def claims(payload: Array[Byte]): Boolean
  /** Full demux + per-frame decode; None = claimed but undecodable. */
  def decode(payload: Array[Byte]): Option[Multimodal.VideoDecoded]
}

/** The JDK-only MJPEG-in-AVI [[FrameDecoder]] — a RIFF container walk
  * (LIST recursion, even-byte chunk padding per the RIFF spec) that reads
  * frame geometry/timing from the `avih` main header, demuxes the
  * compressed video chunks (`##dc`/`##db`) out of the `movi` list, and
  * JPEG-decodes each through [[Multimodal.decodeImage]]. MJPEG is the one
  * video codec a JDK-only runtime can fully decode (every frame is a
  * standalone JPEG); inter-frame codecs (mp4/h264) need a native decoder —
  * that swap point is exactly a second [[FrameDecoder]] implementation.
  * Runs entirely inside an executor task. */
object MjpegAviDecoder extends FrameDecoder {
  private def fourcc(payload: Array[Byte], off: Int): String =
    new String(payload, off, 4, "US-ASCII")

  override def claims(payload: Array[Byte]): Boolean =
    payload.length >= 12 && fourcc(payload, 0) == "RIFF" && fourcc(payload, 8) == "AVI "

  override def decode(payload: Array[Byte]): Option[Multimodal.VideoDecoded] =
    try {
      if (!claims(payload)) return None
      def u32(off: Int): Long =
        (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
      var microSec = 0L; var headerFrames = 0L; var avihW = 0; var avihH = 0
      val frameChunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      // 'NNdc'/'NNdb' frame chunks — plain char checks, no per-payload
      // Pattern.compile on the executor hot path
      def isFrame(fc: String): Boolean =
        fc.length == 4 &&
          fc.charAt(0).isDigit && fc.charAt(1).isDigit &&
          fc.charAt(2) == 'd' && (fc.charAt(3) == 'c' || fc.charAt(3) == 'b')
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val fc = fourcc(payload, off)
          val sz = u32(off + 4).toInt
          val dataStart = off + 8
          val dataEnd = math.min(dataStart + math.max(sz, 0), end)
          if (fc == "LIST" && sz >= 4) walk(dataStart + 4, dataEnd)
          else if (fc == "avih" && sz >= 40) {
            microSec = u32(dataStart)
            headerFrames = u32(dataStart + 16)
            avihW = u32(dataStart + 32).toInt
            avihH = u32(dataStart + 36).toInt
          } else if (isFrame(fc))
            frameChunks += java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
          off = dataStart + math.max(sz, 0) + (sz & 1) // chunks pad to even
        }
      }
      walk(12, math.min(payload.length.toLong, 8L + u32(4)).toInt)
      if (microSec <= 0 && frameChunks.isEmpty) None
      else {
        val decoded = frameChunks.map(Multimodal.decodeImage)
        if (decoded.exists(_.isEmpty)) None // a demuxed chunk that isn't a JPEG: not MJPEG
        else {
          val frames = decoded.map { d =>
            val (w, h, grid) = d.get
            Multimodal.VideoFrame(w, h, if (grid.isEmpty) 0f else grid.sum / grid.length)
          }.toIndexedSeq
          val durMs = if (microSec > 0) frames.length * microSec / 1000 else 0L
          Some(Multimodal.VideoDecoded(
            avihW, avihH, microSec, headerFrames, frames.length, durMs, frames))
        }
      }
    } catch { case _: Exception => None }
}
