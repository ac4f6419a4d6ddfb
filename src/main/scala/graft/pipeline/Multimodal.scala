package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * processed in partition-sized batches.
  *
  * The decode seam is layered honestly: PNG/JPEG dimensions are parsed from
  * REAL container headers in pure JVM code ([[ImageHeaders]] — no codec
  * needed, the header carries them), WAV channel/rate/duration from the
  * real RIFF walk ([[AudioHeaders]]), and MP4 timescale/duration from the
  * real ISO-BMFF box walk ([[VideoHeaders]]); only work that genuinely
  * needs a codec (pixel/sample/frame decoding) falls back to the
  * clearly-marked deterministic STUB (this container has no codecs). Everything around the seam — the binary column, the schema,
  * the batched `mapPartitions` execution shape, the typed output — is the
  * real plumbing a full decoder would plug into: swap `stubDecode` for a
  * JNI/FFmpeg call and nothing else changes.
  */
object Multimodal {

  final case class BlobRow(doc_id: Long, blob: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      frames: Long,
      fmt: String
  )

  /** STUB decoder — deterministic fake features from the raw bytes. A real
    * implementation would parse the container header / run the codec here.
    */
  def stubDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val first = if (n > 0) (bytes(0) & 0xff).toLong else 0L
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 1L + n % 640L,
      height = 1L + first % 480L,
      frames = 1L + n % 7L,
      fmt = (n % 3L) match {
        case 0L => "img"
        case 1L => "aud"
        case _  => "vid"
      }
    )
  }

  /** Layered decode: real PNG/JPEG header parse first (frames = 1 for a
    * still image), stub for everything a header alone cannot describe.
    */
  def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
    ImageHeaders.parse(bytes) match {
      case Some(d) => MediaMeta(docId, bytes.length.toLong, d.width.toLong, d.height.toLong, 1L, d.fmt)
      case None => stubDecode(docId, bytes)
    }

  /** Attach an opaque binary column (here derived from text — stand-in for
    * real media bytes) and run the batched decode. Output columns:
    * (doc_id, n_bytes, width, height, frames, fmt).
    */
  def extractMeta(docs: DataFrame): DataFrame = {
    val blobs = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as(Encoders.product[BlobRow])
    blobs
      .mapPartitions { it => it.map(r => decode(r.doc_id, r.blob)) }(Encoders.product[MediaMeta])
      .toDF()
  }

  /** Oracle-gated REAL-decode path: deterministic synthetic PNG/JPEG blobs
    * (doc_id-derived dimensions, actual signature/chunk/marker bytes via
    * [[ImageHeaders.synthPng]]/[[ImageHeaders.synthJpeg]]) decoded by the
    * real header parser — blob bytes are built and parsed row-locally in
    * one task, nothing binary shuffles. The oracle computes the closed
    * form from doc_id. Output: (doc_id, fmt, width, height).
    */
  def imageHeaderMeta(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (1L + id % 640L).toInt
          val h = (1L + id % 480L).toInt
          val blob =
            if (id % 2L == 0L) ImageHeaders.synthPng(w, h) else ImageHeaders.synthJpeg(w, h)
          val d = ImageHeaders.parse(blob)
            .getOrElse(throw new IllegalStateException(s"synth blob failed to parse for doc $id"))
          (id, d.fmt, d.width.toLong, d.height.toLong)
        }
      }
      .toDF("doc_id", "fmt", "width", "height")
  }

  /** Oracle-gated REAL audio-decode path — the audio twin of
    * [[imageHeaderMeta]]: deterministic synthetic WAV blobs (doc_id-derived
    * channels/rate/width/length, actual RIFF/fmt/data bytes via
    * [[AudioHeaders.synthWav]]) parsed by the real RIFF header walker —
    * built and parsed row-locally in one task, nothing binary shuffles.
    * duration_micros is integer DIV so the DuckDB oracle computes the same
    * closed form from doc_id. NOT folded into the text-stand-in [[decode]]
    * path: "RIFF…WAVE" is valid UTF-8, so a text corpus COULD alias the
    * audio signature (unlike PNG/JPEG signatures, which cannot begin UTF-8
    * text) — real audio bytes enter through [[AudioHeaders.parseWav]].
    * Output: (doc_id, fmt, channels, sample_rate, bits, n_samples,
    * duration_micros).
    */
  def audioHeaderMeta(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val channels = (1L + id % 2L).toInt
          val rate = (id % 4L) match {
            case 0L => 8000; case 1L => 16000; case 2L => 44100; case _ => 48000
          }
          val bits = if (id % 3L == 0L) 8 else 16
          val nSamples = 1L + id % 1000L
          val blob = AudioHeaders.synthWav(channels, rate, bits, nSamples)
          val m = AudioHeaders.parseWav(blob)
            .getOrElse(throw new IllegalStateException(s"synth wav failed to parse for doc $id"))
          (id, "wav", m.channels.toLong, m.sampleRate.toLong, m.bitsPerSample.toLong,
            m.nSamples, m.durationMicros)
        }
      }
      .toDF("doc_id", "fmt", "channels", "sample_rate", "bits", "n_samples", "duration_micros")
  }

  /** Oracle-gated REAL video-container decode path — the video twin of
    * [[imageHeaderMeta]]/[[audioHeaderMeta]]: deterministic synthetic MP4
    * blobs (doc_id-derived timescale/duration, actual ftyp + moov/mvhd
    * bytes via [[VideoHeaders.synthMp4]]) parsed by the real ISO-BMFF box
    * walker, row-locally in one task. With this, every media class exposes
    * its container metadata through REAL byte parsing (PNG/JPEG dims, WAV
    * audio params, MP4 timescale/duration); the stub is left only for work
    * that genuinely needs a codec (pixels, samples, frame extraction).
    * Output: (doc_id, fmt, timescale, duration_ticks, duration_micros).
    */
  def videoHeaderMeta(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val timescale = (id % 4L) match {
            case 0L => 600L; case 1L => 1000L; case 2L => 90000L; case _ => 48000L
          }
          val ticks = 1L + id % 100000L
          val blob = VideoHeaders.synthMp4(timescale, ticks)
          val m = VideoHeaders.parseMp4(blob)
            .getOrElse(throw new IllegalStateException(s"synth mp4 failed to parse for doc $id"))
          (id, "mp4", m.timescale, m.durationTicks, m.durationMicros)
        }
      }
      .toDF("doc_id", "fmt", "timescale", "duration_ticks", "duration_micros")
  }

  /** Aspect-fit resize planning: output dimensions for fitting each medium
    * into a maxW x maxH box, integer arithmetic only (integral division), so
    * the plan is bit-reproducible in ANSI SQL. The pixel resample itself is
    * the pluggable codec step; the planning + plumbing are the real Spark
    * work. Output: (doc_id, width, height, out_w, out_h).
    */
  def resizePlan(docs: DataFrame, maxW: Long, maxH: Long): DataFrame =
    extractMeta(docs)
      .select(
        col("doc_id"),
        col("width"),
        col("height"),
        when(
          col("width") * lit(maxH) <= col("height") * lit(maxW),
          expr(s"(width * $maxH) DIV height")
        ).otherwise(lit(maxW)).as("out_w"),
        when(
          col("width") * lit(maxH) <= col("height") * lit(maxW),
          lit(maxH)
        ).otherwise(expr(s"(height * $maxW) DIV width")).as("out_h")
      )

  /** Deterministic frame sampling: every `everyN`-th frame index of each
    * medium, with a stub per-frame fingerprint (md5(doc_id:idx) — a real
    * pipeline would hash decoded frame bytes). A row explosion (flatMap
    * shape): N media rows -> sum(frames/everyN) frame rows, fully
    * distributed. Output: (doc_id, frame_idx, frame_sha).
    */
  def frameSample(docs: DataFrame, everyN: Int): DataFrame =
    extractMeta(docs)
      .select(
        col("doc_id"),
        explode(sequence(lit(0L), col("frames") - 1, lit(everyN.toLong))).as("frame_idx")
      )
      .withColumn(
        "frame_sha",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string")))
      )
}
