package graft.index

import org.apache.spark.unsafe.types.UTF8String

/** Packed per-doc (term -> tf) payload: the docstore's `tfbin` binary
  * column. Layout: repeated [varint termLen | termBytes | varint tf] until
  * end of buffer (term count is implicit). Varints are unsigned LEB128.
  *
  * Why a binary column and not map<string,int> (the round-5 docstore
  * schema): profiling the bench build (JFR, guide §1) attributed the
  * docstore-write stage's dominant CPU to parquet's nested-map machinery —
  * per-key dictionary encode, RLE/definition levels, UnsafeArrayWriter row
  * conversion — and the segment job paid the map ASSEMBLY again on readback
  * (VectorizedRleValuesReader/IntList frames). One binary cell per doc is a
  * single plain-encoded value on both sides; the term bytes are decoded
  * with zero-copy UTF8String views. Entry order is the tokenizer's
  * first-occurrence order (import: term-sorted) — deterministic either way,
  * and irrelevant to segment bytes (the segment writer sorts terms).
  */
object TfBin {

  @inline def varintSize(v: Int): Int =
    if (v < (1 << 7)) 1 else if (v < (1 << 14)) 2 else if (v < (1 << 21)) 3
    else if (v < (1 << 28)) 4 else 5

  @inline def writeVarint(buf: Array[Byte], pos0: Int, v0: Int): Int = {
    var pos = pos0
    var v = v0
    while ((v & ~0x7f) != 0) {
      buf(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7
    }
    buf(pos) = v.toByte
    pos + 1
  }

  /** Encode `size` (key, count) pairs (keys as UTF8String) into one packed
    * array. Key byte access is zero-copy via `writeToMemory`.
    */
  def encode(keys: Array[UTF8String], counts: Array[Int], size: Int): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < size) {
      val kl = keys(i).numBytes
      bytes += varintSize(kl) + kl + varintSize(counts(i))
      i += 1
    }
    val out = new Array[Byte](bytes)
    var pos = 0
    i = 0
    while (i < size) {
      val k = keys(i)
      val kl = k.numBytes
      pos = writeVarint(out, pos, kl)
      k.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
      pos += kl
      pos = writeVarint(out, pos, counts(i))
      i += 1
    }
    out
  }

  /** Walk the packed entries: f(buffer, termOffset, termLen, tf). The term
    * bytes live inside `bin` — callers wanting a UTF8String view use
    * `UTF8String.fromBytes(bin, off, len)` (no copy).
    */
  @inline def foreachEntry(bin: Array[Byte])(f: (Array[Byte], Int, Int, Int) => Unit): Unit = {
    var pos = 0
    val n = bin.length
    while (pos < n) {
      var kl = 0; var shift = 0
      var b = bin(pos); pos += 1
      while ((b & 0x80) != 0) { kl |= (b & 0x7f) << shift; shift += 7; b = bin(pos); pos += 1 }
      kl |= (b & 0x7f) << shift
      val off = pos
      pos += kl
      var tf = 0; shift = 0
      b = bin(pos); pos += 1
      while ((b & 0x80) != 0) { tf |= (b & 0x7f) << shift; shift += 7; b = bin(pos); pos += 1 }
      tf |= (b & 0x7f) << shift
      f(bin, off, kl, tf)
    }
  }
}
