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

  /** Every-`everyK`-th frame as row-major luminance buffers, oldest
    * first, at most `maxFrames` of them; empty when undecodable.
    */
  def decodeFrames(payload: Array[Byte], everyK: Int,
      maxFrames: Int): Seq[VideoKernel.Frame]
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

    def decodeFrames(payload: Array[Byte], everyK: Int,
        maxFrames: Int): Seq[Frame] =
      probe(payload).toSeq.flatMap { m =>
        (0L until m.nFrames by everyK.toLong).take(maxFrames).map { idx =>
          val px = payload(((idx * 37) % payload.length).toInt) & 0xff
          Frame(idx, 1, 1, Array(px))
        }
      }
  }

  /** Production kernel: `ffprobe` for metadata, `ffmpeg` decoding
    * every K-th frame to 8-bit-gray rawvideo on a pipe (SCALE.md's
    * documented shape). Cluster-safety rules enforced here:
    *  - payload rides stdin (no temp files, no executor-local paths);
    *  - one bounded subprocess per CALL, stdout capped at
    *    `maxOutBytes` — a runaway container cannot fill executor
    *    memory;
    *  - `timeoutMs` wall-clock cap, breach -> destroyForcibly and the
    *    row fails (returns None/empty), never the task;
    *  - any launch failure (binary absent, broken pipe) degrades to
    *    None/empty for the same reason.
    */
  final class Ffmpeg(
      ffprobeBin: String = "ffprobe",
      ffmpegBin: String = "ffmpeg",
      timeoutMs: Long = 30000L,
      maxOutBytes: Int = 64 << 20) extends VideoKernel {

    val name = "ffmpeg"

    private def run(cmd: Seq[String], payload: Array[Byte]): Option[Array[Byte]] =
      try {
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(false)
        val p = pb.start()
        val feeder = new Thread(() =>
          try { p.getOutputStream.write(payload); p.getOutputStream.close() }
          catch { case _: java.io.IOException => () }) // decoder closed early
        feeder.setDaemon(true)
        feeder.start()
        val out = new java.io.ByteArrayOutputStream()
        val in = p.getInputStream
        val buf = new Array[Byte](64 * 1024)
        val deadline = System.nanoTime() + timeoutMs * 1000000L
        var n = in.read(buf)
        var truncated = false
        while (n >= 0 && !truncated) {
          if (out.size() + n > maxOutBytes || System.nanoTime() > deadline) truncated = true
          else { out.write(buf, 0, n); n = in.read(buf) }
        }
        if (truncated || !p.waitFor(math.max(1L,
            (deadline - System.nanoTime()) / 1000000L),
            java.util.concurrent.TimeUnit.MILLISECONDS)) {
          p.destroyForcibly(); None
        } else if (p.exitValue() != 0) None
        else Some(out.toByteArray)
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
          "-of", "default=noprint_wrappers=1", "pipe:0"), payload)
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

    def decodeFrames(payload: Array[Byte], everyK: Int,
        maxFrames: Int): Seq[Frame] =
      probe(payload).toSeq.flatMap { m =>
        if (m.width <= 0 || m.height <= 0) Seq.empty
        else run(Seq(ffmpegBin, "-v", "error", "-i", "pipe:0",
            "-vf", s"select=not(mod(n\\,$everyK))", "-vsync", "vfr",
            "-frames:v", maxFrames.toString,
            "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"), payload)
          .toSeq.flatMap { raw =>
            val frameBytes = m.width * m.height
            (0 until raw.length / frameBytes).map { i =>
              val luma = new Array[Int](frameBytes)
              var j = 0
              while (j < frameBytes) {
                luma(j) = raw(i * frameBytes + j) & 0xff; j += 1
              }
              Frame(i.toLong * everyK, m.width, m.height, luma)
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
    * | "ffmpeg") wins; otherwise ffmpeg when both binaries are on
    * PATH, stub when not.
    */
  def select(): VideoKernel = sys.props.get("graft.video.kernel") match {
    case Some("stub") => Stub
    case Some("ffmpeg") => new Ffmpeg()
    case _ => if (ffmpegAvailable) new Ffmpeg() else Stub
  }
}
