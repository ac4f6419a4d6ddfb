package graft.pipeline

/** Pure-JVM audio container header parsing — extends the multimodal decode
  * seam's REAL half to audio (see [[ImageHeaders]] for the image half and
  * the layering contract): a WAV file's channel count, sample rate, sample
  * width and duration live in the RIFF container header, not the sample
  * stream, so they are decodable from bytes alone with no codec library.
  *
  * Layout (RIFF little-endian, the one container every recorder emits):
  * `"RIFF" u32(riffSize) "WAVE"`, then a chunk walk — `"fmt "` carries
  * audioFormat/channels/sampleRate/byteRate/blockAlign/bitsPerSample,
  * `"data"` carries the payload whose byte size over blockAlign is the
  * sample-frame count. Chunks pad to even offsets per the RIFF spec.
  *
  * Compressed containers (MP3/OGG/MP4) need a codec to know duration —
  * those stay behind the labeled stub ([[Multimodal.stubDecode]]); this is
  * the same honest boundary the image half draws at pixel decoding.
  *
  * `synthWav` emits a minimal REAL file (canonical 44-byte header + zeroed
  * PCM frames) so specs and oracle gates round-trip actual byte parsing;
  * the spec cross-checks against the JDK's own `javax.sound.sampled`
  * reader, which accepts these files.
  */
object AudioHeaders {

  /** duration_micros = nSamples * 1_000_000 / sampleRate, integer DIV — the
    * closed form the DuckDB oracle reproduces exactly.
    */
  final case class WavMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Long,
      durationMicros: Long
  )

  @inline private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  @inline private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
  @inline private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** Parse a RIFF/WAVE header. None for anything that is not a well-formed
    * PCM-style WAV (missing chunks, zero blockAlign, truncated walk) — the
    * caller falls back to the stub, never throws.
    */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    val b = bytes
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L
    var fmtSeen = false
    while (i + 8 <= b.length && (!fmtSeen || dataSize < 0)) {
      val size = u32le(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return None
      if (tag(b, i, "fmt ")) {
        if (size < 16) return None
        // PCM-family only (1 = PCM, 3 = IEEE float, 0xFFFE = extensible):
        // for compressed formats (ADPCM, MP3-in-RIFF) blockAlign is the
        // compressed block size, so dataSize/blockAlign would be a silently
        // wrong frame count — those stay behind the labeled stub
        val audioFormat = u16le(b, i + 8)
        if (audioFormat != 1 && audioFormat != 3 && audioFormat != 0xfffe) return None
        channels = u16le(b, i + 10)
        rate = u32le(b, i + 12).toInt
        blockAlign = u16le(b, i + 20)
        bits = u16le(b, i + 22)
        fmtSeen = true
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // RIFF chunks pad to even
    }
    if (!fmtSeen || dataSize < 0 || channels <= 0 || rate <= 0 || blockAlign <= 0) None
    else {
      val nSamples = dataSize / blockAlign
      Some(WavMeta(channels, rate, bits, nSamples, nSamples * 1000000L / rate))
    }
  }

  /** Minimal real PCM WAV: canonical 44-byte header + zeroed sample frames.
    * `javax.sound.sampled.AudioSystem` reads these (spec cross-check).
    */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int, nSamples: Long): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bitsPerSample % 8 == 0 && bitsPerSample > 0 && nSamples >= 0)
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    require(dataSize <= Int.MaxValue - 44, "synthWav data too large")
    val out = new java.io.ByteArrayOutputStream(44 + dataSize.toInt)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    tag("RIFF"); w32(36L + dataSize); tag("WAVE")
    tag("fmt "); w32(16L)
    w16(1) // PCM
    w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * blockAlign) // byte rate
    w16(blockAlign); w16(bitsPerSample)
    tag("data"); w32(dataSize)
    out.write(new Array[Byte](dataSize.toInt))
    out.toByteArray
  }
}
