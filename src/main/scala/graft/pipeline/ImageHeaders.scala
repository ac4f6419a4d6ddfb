package graft.pipeline

/** Pure-JVM image container header parsing — the REAL half of the multimodal
  * decode seam (no codec library in this container, but dimensions live in
  * the container header, not the pixel stream, so width/height/format are
  * decodable from bytes alone):
  *
  *   - PNG: 8-byte signature, then the IHDR chunk (must be first per the
  *     PNG spec) — width/height are big-endian u32 at offsets 16/20.
  *   - JPEG: SOI (FFD8) then a marker-segment walk; the frame header SOFn
  *     (FFC0-FFCF minus DHT FFC4 / JPG FFC8 / DAC FFCC) carries height and
  *     width as big-endian u16 at +5/+7 past the marker.
  *
  * Anything else (audio/video/garbage) returns None and the caller falls
  * back to [[Multimodal.stubDecode]] — the honest boundary: real container
  * parsing where a header suffices, labeled stub where a codec would be
  * needed.
  *
  * The `synthPng`/`synthJpeg` builders emit minimal REAL headers (valid
  * signature, chunk layout, CRC32 for PNG) so specs and oracle gates can
  * round-trip actual byte parsing without committed binary fixtures.
  */
object ImageHeaders {

  final case class Dims(fmt: String, width: Int, height: Int)

  private val PngSig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def parse(bytes: Array[Byte]): Option[Dims] =
    parsePng(bytes).orElse(parseJpeg(bytes))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) | (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  private def parsePng(b: Array[Byte]): Option[Dims] = {
    if (b.length < 24) return None
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR: 4-byte length (13), "IHDR", width, height
    if (u32(b, 8) != 13L) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = u32(b, 16)
    val h = u32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Dims("png", w.toInt, h.toInt))
  }

  private def parseJpeg(b: Array[Byte]): Option[Dims] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // marker desync = not a JPEG we trust
      val m = u8(b, i + 1)
      if (m == 0xff) { i += 1 } // fill bytes before a marker are legal
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // no payload
      else if (m == 0xd9 || m == 0xda) return None // EOI / SOS before any SOF
      else {
        val segLen = u16(b, i + 2)
        if (segLen < 2 || i + 2 + segLen > b.length) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (segLen < 7) return None
          val h = u16(b, i + 5)
          val w = u16(b, i + 7)
          return if (w <= 0 || h <= 0) None else Some(Dims("jpeg", w, h))
        }
        i += 2 + segLen
      }
    }
    None
  }

  // ---------------------------------------------------- synthetic builders

  /** Minimal real PNG: signature + IHDR (8-bit truecolor, real CRC32) +
    * empty IDAT + IEND. Parses in any PNG reader that stops at the header.
    */
  def synthPng(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(64)
    PngSig.foreach(out.write)
    def chunk(tag: String, payload: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] =
        Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(payload.length.toLong), 0, 4)
      val tb = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(payload)
      out.write(tb, 0, 4)
      out.write(payload, 0, payload.length)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    chunk("IHDR", ihdr)
    chunk("IDAT", Array.emptyByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal real JPEG: SOI + JFIF APP0 + single-component SOF0 + EOI. */
  def synthJpeg(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(40)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w8(0xff); w8(0xd8) // SOI
    // APP0 JFIF (the segment walk must skip it to reach SOF0)
    w8(0xff); w8(0xe0); w16(16)
    "JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII).foreach(b => w8(b.toInt))
    w8(0); w8(1); w8(1) // version 1.1
    w8(0); w16(1); w16(1) // aspect-ratio units, 1:1 density
    w8(0); w8(0) // no thumbnail
    // SOF0: len 11, precision 8, height, width, 1 component (id 1, 1x1, q0)
    w8(0xff); w8(0xc0); w16(11)
    w8(8); w16(height); w16(width); w8(1)
    w8(1); w8(0x11); w8(0)
    // SOS (1 component) — strict readers (JDK ImageIO) refuse to report
    // frame dimensions from a file whose structure ends before the scan
    w8(0xff); w8(0xda); w16(8)
    w8(1); w8(1); w8(0)
    w8(0); w8(0x3f); w8(0)
    w8(0xff); w8(0xd9) // EOI
    out.toByteArray
  }
}
