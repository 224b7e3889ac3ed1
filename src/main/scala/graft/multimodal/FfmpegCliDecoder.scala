package graft.multimodal

/** FFmpeg-CLI-backed [[FrameDecoder]] for inter-frame containers (mp4 and
  * friends carrying an `ftyp` box) — the production swap point the
  * [[FrameDecoder]] seam documents, implemented for real: registered in
  * [[Multimodal.frameDecoders]] AHEAD of the JDK decoder, it claims a
  * payload only when BOTH the container signature matches AND the `ffmpeg`
  * + `ffprobe` binaries are resolvable on this executor's PATH (or via
  * `GRAFT_FFMPEG_DIR`). On hosts without FFmpeg, `claims` is false and the
  * dispatch falls through exactly as before — MJPEG/AVI to
  * [[MjpegAviDecoder]], mp4 to [[Multimodal.stubDecode]] — so registering
  * this decoder changes NOTHING on a JDK-only deployment (the media
  * oracles are pinned either way).
  *
  * Decode shape: the payload lands in a task-local temp file (FFmpeg needs
  * seekable input for mp4 moov parsing — stdin piping fails on
  * faststart-less files), `ffprobe` reads the stream geometry/timing, and
  * one `ffmpeg` run demuxes+decodes the video stream to raw 8-bit gray
  * frames on stdout, which stream through a fixed `width*height` buffer —
  * per-frame mean luminance only, never the whole clip in memory. Frame
  * count is capped at [[MaxFrames]] and a NO-PROGRESS watchdog (armed
  * BEFORE the stdout read — a silent hung child blocks the read, so a
  * post-read check would never run; deadline resets on every byte, so long
  * legitimate decodes keep streaming) force-kills the subprocess TREE past
  * `timeoutSec` of output silence: a hostile or broken payload costs a
  * bounded task, not a wedged executor. Any failure (unparseable probe, nonzero exit, zero
  * frames) returns None so callers keep their stub fallback — the
  * [[FrameDecoder]] contract's claim-but-fail fallthrough, pinned by
  * MultimodalSpec.
  *
  * Thread-safety: stateless (each decode owns its temp file + processes);
  * Serializable: object, binary resolution is a lazy val re-evaluated per
  * JVM (executors resolve their OWN PATH, not the driver's).
  */
object FfmpegCliDecoder extends FrameDecoder {
  private val MaxFrames = 100000
  /** Read per call (not a val) so tests can shrink it; production default
    * 120 s bounds one decode attempt end-to-end. */
  private def timeoutSec: Long =
    sys.props.get("graft.ffmpeg.timeoutSec").flatMap(_.toLongOption).getOrElse(120L)

  /** Resolve a binary: `GRAFT_FFMPEG_DIR` (explicit deployment pin) first,
    * then PATH. Lazy per JVM — executors re-resolve locally. */
  private def resolve(bin: String): Option[String] = {
    val explicitDir = sys.env.get("GRAFT_FFMPEG_DIR").map(d => new java.io.File(d, bin))
    val onPath = sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .iterator.map(p => new java.io.File(p, bin))
    (explicitDir.iterator ++ onPath)
      .find(f => f.isFile && f.canExecute).map(_.getAbsolutePath)
  }

  @transient private lazy val binaries: Option[(String, String)] =
    for { fm <- resolve("ffmpeg"); fp <- resolve("ffprobe") } yield (fm, fp)

  /** True when this JVM can actually run the decode. */
  def available: Boolean = binaries.isDefined

  /** mp4-family signature: a box header whose type is `ftyp` at offset 4.
    * Binary presence is part of the claim so that on FFmpeg-less hosts the
    * dispatch never consults this decoder (stub fallback preserved). */
  override def claims(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(4) == 'f' && payload(5) == 't' && payload(6) == 'y' && payload(7) == 'p' &&
      available

  private[graft] def run(cmd: Seq[String], readStdout: java.io.InputStream => Unit): Boolean = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    p.getOutputStream.close()
    // NO-PROGRESS watchdog armed BEFORE the stdout read: readStdout blocks
    // in in.read / transferTo until the child writes or closes stdout, so a
    // child that hangs producing NO output (hostile or broken payload)
    // would otherwise block the task forever — a post-read waitFor timeout
    // never runs. The deadline resets on every read, so a long clip that
    // legitimately streams for longer than timeoutSec keeps running as long
    // as bytes keep flowing; only timeoutSec of SILENCE kills. The kill
    // closes the child's side of the pipe, unblocking the read; the nonzero
    // exit then fails the run → None → stub fallback. Interrupted on normal
    // completion so the daemon thread doesn't linger.
    // Kill the WHOLE tree: destroying only the direct child leaves any
    // grandchildren holding the stdout pipe open, so the blocked read would
    // not unblock until they exit on their own.
    def killTree(): Unit = {
      p.descendants().forEach(h => { h.destroyForcibly(); () })
      p.destroyForcibly(); ()
    }
    val lastProgress = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val monitored: java.io.InputStream = new java.io.FilterInputStream(p.getInputStream) {
      override def read(): Int = {
        val n = super.read(); lastProgress.set(System.nanoTime()); n
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = super.read(b, off, len); lastProgress.set(System.nanoTime()); n
      }
    }
    val watchdog = new Thread(() =>
      try {
        var alive = true
        while (alive) {
          if (p.waitFor(1, java.util.concurrent.TimeUnit.SECONDS)) alive = false
          else if (System.nanoTime() - lastProgress.get > timeoutSec * 1000L * 1000 * 1000) {
            killTree(); alive = false
          }
        }
      } catch { case _: InterruptedException => () },
      "graft-ffmpeg-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    try {
      readStdout(monitored)
      if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
        killTree(); false
      } else p.exitValue() == 0
    } catch {
      case _: Exception => killTree(); false
    } finally {
      watchdog.interrupt()
      try p.getInputStream.close() catch { case _: Exception => () }
    }
  }

  override def decode(payload: Array[Byte]): Option[Multimodal.VideoDecoded] =
    try {
      if (!claims(payload)) return None
      val (ffmpeg, ffprobe) = binaries.get
      val tmp = java.io.File.createTempFile("graft_ffmpeg_", ".mp4")
      try {
        java.nio.file.Files.write(tmp.toPath, payload)
        // geometry + timing: width,height,avg_frame_rate,nb_frames (csv)
        val probeOut = new java.io.ByteArrayOutputStream()
        val probed = run(Seq(ffprobe, "-v", "error", "-select_streams", "v:0",
          "-show_entries", "stream=width,height,avg_frame_rate,nb_frames",
          "-of", "csv=p=0", tmp.getAbsolutePath),
          in => { in.transferTo(probeOut); () })
        if (!probed) return None
        val fields = probeOut.toString("US-ASCII").trim.split(",", -1)
        if (fields.length < 3) return None
        // geometry must parse (it sizes the frame buffer) — but parse it
        // with Option, not a throw the outer catch converts to None anyway
        val w = fields(0).trim.toIntOption.getOrElse(return None)
        val h = fields(1).trim.toIntOption.getOrElse(return None)
        if (w <= 0 || h <= 0) return None
        // timing degrades GRACEFULLY: ffprobe prints 'N/A' (or 0/0) for
        // containers it can demux but not fully characterize — that must
        // cost the fps/duration fields (0, like nb_frames' toLongOption),
        // not the whole real decode
        val fps = fields(2).trim.split("/") match {
          case Array(n, d) =>
            (n.trim.toDoubleOption, d.trim.toDoubleOption) match {
              case (Some(nv), Some(dv)) if dv != 0 => nv / dv
              case _ => 0.0
            }
          case Array(n) => n.trim.toDoubleOption.getOrElse(0.0)
          case _ => 0.0
        }
        val headerFrames = if (fields.length >= 4) fields(3).trim.toLongOption.getOrElse(0L) else 0L
        // stream raw gray frames; one frame-sized buffer, mean luma per frame
        val frames = scala.collection.mutable.ArrayBuffer.empty[Multimodal.VideoFrame]
        val ok = run(Seq(ffmpeg, "-v", "error", "-i", tmp.getAbsolutePath,
          "-map", "0:v:0", "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"), { in =>
          val frameBytes = w * h
          val buf = new Array[Byte](frameBytes)
          var done = false
          while (!done && frames.length < MaxFrames) {
            var off = 0
            var eof = false
            while (off < frameBytes && !eof) {
              val n = in.read(buf, off, frameBytes - off)
              if (n < 0) eof = true else off += n
            }
            if (off == frameBytes) {
              var sum = 0L
              var i = 0
              while (i < frameBytes) { sum += (buf(i) & 0xff); i += 1 }
              frames += Multimodal.VideoFrame(w, h, (sum.toDouble / frameBytes / 255.0).toFloat)
            } else done = true // trailing partial frame (or EOF) ends the stream
          }
          // Cap hit: close the pipe so ffmpeg dies on EPIPE immediately
          // (instead of blocking on a full pipe until the timeout kill).
          if (frames.length >= MaxFrames) in.close()
        })
        // Refusal at the cap is decided HERE, not via ffmpeg's exit code:
        // when the frames beyond the cap already fit in the OS pipe buffer,
        // ffmpeg exits 0 before the close lands (no EPIPE) and an exit-code
        // check would present a silently TRUNCATED clip as a successful
        // decode. A pathological MaxFrames+ cell is refused, not half-read.
        if (!ok || frames.isEmpty || frames.length >= MaxFrames) None
        else {
          val microSecPerFrame = if (fps > 0) math.round(1e6 / fps) else 0L
          Some(Multimodal.VideoDecoded(
            w, h, microSecPerFrame, headerFrames, frames.length,
            frames.length * microSecPerFrame / 1000, frames.toIndexedSeq))
        }
      } finally { tmp.delete(); () }
    } catch { case _: Exception => None }
}
