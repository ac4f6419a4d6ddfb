package graft.pipeline

/** Pure-JVM video container header parsing — the video half of the
  * multimodal decode seam's REAL layer ([[ImageHeaders]] images,
  * [[AudioHeaders]] audio): an ISO base-media file (MP4/MOV, ISO 14496-12)
  * carries its presentation timescale and duration in the `moov/mvhd` box —
  * header metadata, no codec required. Frame decoding, sample tables and
  * per-track details stay behind the labeled stub
  * ([[Multimodal.stubDecode]]) — the same honest boundary the other halves
  * draw at pixel/sample decoding.
  *
  * Box layout: `[u32 size][4cc type]` big-endian, `size == 1` switches to a
  * u64 largesize, `size == 0` means to-end-of-file; `mvhd` version 0 holds
  * u32 creation/modification/timescale/duration, version 1 widens the times
  * and duration to u64. The walk requires a leading `ftyp` (every real
  * MP4/MOV starts with one), then finds `moov` and its `mvhd` child.
  *
  * `synthMp4` emits a minimal REAL file (`ftyp` + `moov/mvhd`, canonical
  * 108-byte version-0 mvhd) so specs and oracle gates round-trip actual
  * byte parsing.
  */
object VideoHeaders {

  /** durationMicros = durationTicks * 1_000_000 / timescale, integer DIV —
    * the closed form the DuckDB oracle reproduces exactly.
    */
  final case class Mp4Meta(
      brand: String,
      timescale: Long,
      durationTicks: Long,
      durationMicros: Long
  )

  @inline private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xff).toLong << 24) | ((b(i + 1) & 0xff).toLong << 16) |
      ((b(i + 2) & 0xff).toLong << 8) | (b(i + 3) & 0xff).toLong
  @inline private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  @inline private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse an ISO-BMFF header. None for anything that is not a well-formed
    * MP4/MOV front (no leading ftyp, missing moov/mvhd, truncated or
    * overrunning boxes, zero timescale) — callers fall back to the stub,
    * never throw.
    */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    val b = bytes
    if (b.length < 16 || fourcc(b, 4) != "ftyp") return None
    val brand = fourcc(b, 8)
    // top-level walk for moov
    var i = 0
    while (i + 8 <= b.length) {
      val size0 = u32be(b, i)
      val typ = fourcc(b, i + 4)
      val (hdr, size) =
        if (size0 == 1L) { if (i + 16 > b.length) return None; (16, u64be(b, i + 8)) }
        else if (size0 == 0L) (8, (b.length - i).toLong) // box extends to EOF
        else (8, size0)
      if (size < hdr || i + size > b.length) return None
      if (typ == "moov") {
        // child walk for mvhd
        var j = i + hdr
        val end = i + size.toInt
        while (j + 8 <= end) {
          val cs0 = u32be(b, j)
          val ct = fourcc(b, j + 4)
          val (chdr, cs) =
            if (cs0 == 1L) { if (j + 16 > end) return None; (16, u64be(b, j + 8)) }
            else if (cs0 == 0L) (8, (end - j).toLong)
            else (8, cs0)
          if (cs < chdr || j + cs > end) return None
          if (ct == "mvhd") {
            val p = j + chdr
            // bounds are the mvhd BOX's own end — checking against the
            // enclosing moov would let a short mvhd read its sibling's bytes
            val boxEnd = j + cs.toInt
            if (p + 4 > boxEnd) return None
            val version = b(p) & 0xff
            val (timescale, duration) =
              if (version == 0) {
                if (p + 20 > boxEnd) return None
                (u32be(b, p + 12), u32be(b, p + 16))
              } else if (version == 1) {
                if (p + 32 > boxEnd) return None
                (u32be(b, p + 20), u64be(b, p + 24))
              } else return None
            // v1 duration is a u64: reject values whose micros would
            // overflow Long rather than return wrapped garbage
            return if (timescale <= 0 || duration < 0 || duration > Long.MaxValue / 1000000L) None
            else Some(Mp4Meta(brand, timescale, duration, duration * 1000000L / timescale))
          }
          j += cs.toInt
        }
        return None // moov without mvhd
      }
      i += size.toInt
    }
    None
  }

  /** Minimal real MP4: `ftyp` (isom) + `moov` containing a canonical
    * 108-byte version-0 `mvhd` (identity matrix, rate 1.0, volume 1.0).
    */
  def synthMp4(timescale: Long, durationTicks: Long): Array[Byte] = {
    require(timescale > 0 && timescale <= 0xffffffffL &&
      durationTicks >= 0 && durationTicks <= 0xffffffffL)
    val out = new java.io.ByteArrayOutputStream(16 + 116)
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    // ftyp: major brand isom, minor version 512, compatible [isom]
    w32(20L); tag("ftyp"); tag("isom"); w32(512L); tag("isom")
    // moov { mvhd }
    w32(8L + 108L); tag("moov")
    w32(108L); tag("mvhd")
    w32(0L) // version 0 + flags
    w32(0L); w32(0L) // creation, modification
    w32(timescale); w32(durationTicks)
    w32(0x00010000L) // rate 1.0 (16.16 fixed)
    out.write(1); out.write(0) // volume 1.0 (8.8 fixed)
    out.write(0); out.write(0) // reserved u16
    w32(0L); w32(0L) // reserved u32[2]
    // unity matrix (9 x 32-bit fixed-point)
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(w32)
    (0 until 6).foreach(_ => w32(0L)) // pre_defined u32[6]
    w32(2L) // next_track_ID
    out.toByteArray
  }
}
