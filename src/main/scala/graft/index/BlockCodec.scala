package graft.index

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** Posting-block codec: docID-delta + varint (LEB128) compression with
  * per-block max-score-BOUND metadata (north_rule).
  *
  * Replaces the reference's fixed-width little-endian record stream
  * (/root/reference/src/core/inverted_index.cpp:67-161) with a compressed,
  * skippable layout: each block holds up to `BlockSize` postings
  * (docId, tf, dl) — docIds delta-encoded within the block (first one
  * absolute), tf and dl as plain varints — plus (minDoc, maxDoc, count,
  * maxTf, minDl) so a scorer can skip a whole block when its score upper
  * bound cannot beat the current top-k threshold (block-max WAND).
  *
  * The bound inputs are STATISTICS-FREE by design: BM25's term part is
  * increasing in tf and decreasing in dl, so idf * part(maxTf, minDl) is a
  * safe upper bound for every posting in the block under ANY (df, N, avgdl).
  * That makes blocks immutable under incremental document adds — global
  * stats change, baked bounds stay valid — at the cost of a slightly looser
  * bound than an exact baked max-score (maxTf and minDl may come from
  * different postings).
  *
  * dl rides in the block so the exact BM25 score is computable during the
  * merge without any docstore lookup.
  */
object BlockCodec {

  val BlockSize = 128

  /** Codec ids as recorded in `Meta.codec`. Varint is the default;
    * `pfor-delta` is the patched frame-of-reference alternative (the
    * north_rule's "varint/PForDelta" pair) — same block metadata, denser
    * bytes (see [[encodeColumnarPfor]]).
    */
  val CodecVarint = "delta-varint"
  val CodecPfor = "pfor-delta"

  /** One encoded block of a posting list. `(maxTf, minDlOverTf)` feed
    * Bm25.partBound — a safe score upper bound under any (idf, avgdl).
    * `pfor` tags which codec produced `bytes` (set by the writer or from
    * the segment file's magic at load — blocks are self-dispatching so
    * call sites never thread codec state).
    */
  final case class Block(
      minDoc: Long,
      maxDoc: Long,
      count: Int,
      maxTf: Int,
      minDlOverTf: Double,
      bytes: Array[Byte],
      pfor: Boolean = false
  )

  /** One decoded posting. */
  final case class Posting(docId: Long, tf: Int, dl: Int)

  // ------------------------------------------------------------------ varint
  def writeVarLong(out: ByteArrayOutputStream, value: Long): Unit = {
    require(value >= 0, s"varint requires non-negative, got $value")
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  final class ByteReader(val bytes: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def position: Int = pos
    def advance(n: Int): Unit = pos += n
    def readByte(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def readVarLong(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
  }

  // ------------------------------------------------------------------ blocks
  /** Encode a docId-sorted posting list into blocks with statistics-free
    * bound metadata (per-block max tf and min dl).
    */
  def encode(postings: Seq[Posting]): IndexedSeq[Block] = {
    val out = ArrayBuffer[Block]()
    postings.grouped(BlockSize).foreach { group =>
      val buf = new ByteArrayOutputStream(group.size * 4)
      var prev = 0L
      var first = true
      var maxTf = 0
      var minDlOverTf = Double.MaxValue
      group.foreach { p =>
        val delta = if (first) p.docId else p.docId - prev
        require(first || delta > 0, s"postings must be strictly docId-ascending")
        writeVarLong(buf, delta)
        writeVarLong(buf, p.tf.toLong)
        writeVarLong(buf, p.dl.toLong)
        prev = p.docId
        first = false
        if (p.tf > maxTf) maxTf = p.tf
        val r = p.dl.toDouble / p.tf
        if (r < minDlOverTf) minDlOverTf = r
      }
      out += Block(group.head.docId, group.last.docId, group.size, maxTf, minDlOverTf, buf.toByteArray)
    }
    out.toIndexedSeq
  }

  /** Columnar twin of [[encode]]: same bytes, zero per-posting objects —
    * the build's segment-write stage feeds postings from reusable primitive
    * arrays (one Posting allocation per corpus posting was a top GC source
    * at 32 threads). Byte-identical output to encode() by construction
    * (same grouping, same deltas).
    */
  /** Varint into a plain byte array at `pos` (r6): the encode hot loop went
    * through ByteArrayOutputStream, whose per-byte `write` is synchronized —
    * up to ~9 monitor-guarded virtual calls per posting on the segment-write
    * stage. Same bytes, straight-line stores.
    */
  @inline private def putVarLong(buf: Array[Byte], pos0: Int, value: Long): Int = {
    var pos = pos0
    var v = value
    while ((v & ~0x7fL) != 0L) {
      buf(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1
      v >>>= 7
    }
    buf(pos) = v.toByte
    pos + 1
  }

  def encodeColumnar(
      docIds: Array[Long],
      tfs: Array[Int],
      dls: Array[Int],
      n: Int
  ): IndexedSeq[Block] = {
    val out = ArrayBuffer[Block]()
    // worst case 10 bytes per varint, 3 varints per posting
    val buf = new Array[Byte](BlockSize * 30)
    var off = 0
    while (off < n) {
      val cnt = math.min(BlockSize, n - off)
      var pos = 0
      var prev = 0L
      var maxTf = 0
      var minDlOverTf = Double.MaxValue
      var i = 0
      while (i < cnt) {
        val d = docIds(off + i)
        val tf = tfs(off + i)
        val dl = dls(off + i)
        val delta = if (i == 0) d else d - prev
        require(i == 0 || delta > 0, "postings must be strictly docId-ascending")
        pos = putVarLong(buf, pos, delta)
        pos = putVarLong(buf, pos, tf.toLong)
        pos = putVarLong(buf, pos, dl.toLong)
        prev = d
        if (tf > maxTf) maxTf = tf
        val r = dl.toDouble / tf
        if (r < minDlOverTf) minDlOverTf = r
        i += 1
      }
      out += Block(docIds(off), docIds(off + cnt - 1), cnt, maxTf, minDlOverTf,
        java.util.Arrays.copyOf(buf, pos))
      off += cnt
    }
    out.toIndexedSeq
  }

  /** Columnar decoded form — primitive arrays, no per-posting object. */
  final case class DecodedBlock(docIds: Array[Long], tfs: Array[Int], dls: Array[Int]) {
    def length: Int = docIds.length
  }

  def decodePrimitive(block: Block): DecodedBlock =
    if (block.pfor) decodePrimitivePfor(block) else decodePrimitiveVarint(block)

  private def decodePrimitiveVarint(block: Block): DecodedBlock = {
    val r = new ByteReader(block.bytes)
    val docIds = new Array[Long](block.count)
    val tfs = new Array[Int](block.count)
    val dls = new Array[Int](block.count)
    var prev = 0L
    var i = 0
    while (i < block.count) {
      val doc = if (i == 0) r.readVarLong() else prev + r.readVarLong()
      docIds(i) = doc
      tfs(i) = r.readVarLong().toInt
      dls(i) = r.readVarLong().toInt
      prev = doc
      i += 1
    }
    DecodedBlock(docIds, tfs, dls)
  }

  def decode(block: Block): Array[Posting] = {
    val d = decodePrimitive(block)
    Array.tabulate(block.count)(i => Posting(d.docIds(i), d.tfs(i), d.dls(i)))
  }

  // --------------------------------------------------------------- PFOR-delta
  // Patched frame-of-reference (the north_rule's "PForDelta" option): each
  // block stores the first docId as an absolute varint, then THREE bit-packed
  // columns — docId deltas (count-1), tfs, dls — each as
  //   [width byte w][varint nExceptions][ceil(m*w/8) packed bytes][exceptions]
  // where the per-column width w is chosen to MINIMIZE total bytes: values
  // wider than w bits become (varint position, varint value) exception pairs
  // and their packed slot holds 0 (unambiguous — deltas, tfs and dls are all
  // strictly positive, and the first docId is not packed). This keeps one
  // huge outlier (a sparse term crossing a large docId gap) from inflating
  // the whole block's width — the PFOR idea — while staying byte-for-byte
  // deterministic (the width choice is a pure function of the values).
  // Block METADATA is identical to the varint codec's, so block-max WAND
  // skipping and every statistics-free-bound property hold unchanged.

  private def bitLen(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  private def varintLen(v: Long): Int = {
    var n = 1
    var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    n
  }

  /** Write `v`'s low `w` bits at absolute bit offset `bitPos` of `arr`
    * (little-endian bit order within and across bytes).
    */
  private def writeBits(arr: Array[Byte], bitPos: Long, v: Long, w: Int): Unit = {
    var got = 0
    var bp = bitPos
    while (got < w) {
      val byteIdx = (bp >> 3).toInt
      val bitOff = (bp & 7).toInt
      val take = math.min(8 - bitOff, w - got)
      val bits = ((v >>> got) & ((1L << take) - 1)).toInt
      arr(byteIdx) = (arr(byteIdx) | (bits << bitOff)).toByte
      got += take
      bp += take
    }
  }

  private def readBits(arr: Array[Byte], base: Int, bitPos: Long, w: Int): Long = {
    var v = 0L
    var got = 0
    var bp = bitPos
    while (got < w) {
      val byteIdx = base + (bp >> 3).toInt
      val bitOff = (bp & 7).toInt
      val take = math.min(8 - bitOff, w - got)
      val bits = ((arr(byteIdx) & 0xff) >>> bitOff) & ((1 << take) - 1)
      v |= bits.toLong << got
      got += take
      bp += take
    }
    v
  }

  /** One packed column into `buf` at `pos0`: choose the cost-minimal width
    * (ties -> narrower), pack, patch; returns the new position. All values
    * must be > 0 (slot 0 marks an exception).
    *
    * Byte-identical to the ByteArrayOutputStream version it replaces (r6:
    * PforMicro digests match). Two kernel changes: the width scan buckets
    * per-value bit lengths and exception costs once and walks suffix sums —
    * O(m + 64) instead of O(m * maxBits) bitLen calls — and bytes go into a
    * plain array instead of through BAOS's synchronized per-byte `write`.
    * The cost function is unchanged, so the chosen width (and therefore
    * every byte) is unchanged.
    */
  private def putPacked(buf: Array[Byte], pos0: Int, values: Array[Long], m: Int): Int = {
    val cnt = new Array[Int](65)
    val excCost = new Array[Int](65)
    var maxBits = 0
    var i = 0
    while (i < m) {
      val v = values(i)
      require(v > 0, s"pfor packed values must be positive, got $v")
      val bl = bitLen(v)
      if (bl > maxBits) maxBits = bl
      cnt(bl) += 1
      excCost(bl) += varintLen(i.toLong) + varintLen(v)
      i += 1
    }
    // walk widths maxBits -> 0 accumulating suffix sums; `<=` keeps the
    // narrower width on cost ties, matching the ascending-strict-< original
    var bestW = 0
    var bestCost = Int.MaxValue
    var nExcW = 0
    var excBytesW = 0
    var w = maxBits
    while (w >= 0) {
      val cost = 1 + varintLen(nExcW.toLong) + ((m.toLong * w + 7) >> 3).toInt + excBytesW
      if (cost <= bestCost) { bestCost = cost; bestW = w }
      if (w > 0) { nExcW += cnt(w); excBytesW += excCost(w) }
      w -= 1
    }
    var nExc = 0
    var b = bestW + 1
    while (b <= maxBits) { nExc += cnt(b); b += 1 }
    var pos = pos0
    buf(pos) = bestW.toByte; pos += 1
    pos = putVarLong(buf, pos, nExc.toLong)
    val packedLen = ((m.toLong * bestW + 7) >> 3).toInt
    if (bestW > 0 && bestW <= 56) {
      // slots are consecutive w-bit fields in little-endian bit order, so a
      // sequential bit accumulator emits the identical bytes without the
      // per-value writeBits byte-straddling loop (exception slots stay 0)
      var acc = 0L
      var bits = 0
      var p = pos
      i = 0
      while (i < m) {
        val v = values(i)
        if (bitLen(v) <= bestW) acc |= v << bits
        bits += bestW
        while (bits >= 8) { buf(p) = acc.toByte; p += 1; acc >>>= 8; bits -= 8 }
        i += 1
      }
      if (bits > 0) buf(p) = acc.toByte
    } else if (bestW > 0) {
      java.util.Arrays.fill(buf, pos, pos + packedLen, 0.toByte)
      i = 0
      while (i < m) {
        if (bitLen(values(i)) <= bestW)
          writeBits(buf, (pos.toLong << 3) + i.toLong * bestW, values(i), bestW)
        i += 1
      }
    }
    pos += packedLen
    i = 0
    while (i < m) {
      if (bestW == 0 || bitLen(values(i)) > bestW) {
        pos = putVarLong(buf, pos, i.toLong)
        pos = putVarLong(buf, pos, values(i))
      }
      i += 1
    }
    pos
  }

  private def readPacked(r: ByteReader, m: Int): Array[Long] = {
    val w = r.readByte()
    val nExc = r.readVarLong().toInt
    val out = new Array[Long](m)
    val base = r.position
    if (w > 0 && w <= 56) {
      // sequential bit-accumulator fast path (r6): bytes enter the 64-bit
      // accumulator once each instead of per-value readBits re-reads. Safe
      // while w + 7 spare bits fit the accumulator, i.e. w <= 56 — every
      // realistic column (deltas/tfs/dls) is far narrower.
      val bytes = r.bytes
      val mask = (1L << w) - 1
      var acc = 0L
      var bits = 0
      var p = base
      var i = 0
      while (i < m) {
        while (bits < w) { acc |= (bytes(p) & 0xffL) << bits; p += 1; bits += 8 }
        out(i) = acc & mask
        acc >>>= w
        bits -= w
        i += 1
      }
    } else if (w > 0) {
      var i = 0
      while (i < m) { out(i) = readBits(r.bytes, base, i.toLong * w, w); i += 1 }
    }
    r.advance(((m.toLong * w + 7) >> 3).toInt)
    var e = 0
    while (e < nExc) {
      val pos = r.readVarLong().toInt
      out(pos) = r.readVarLong()
      e += 1
    }
    out
  }

  /** PFOR twin of [[encodeColumnar]]: identical grouping and block metadata,
    * patched-FOR bytes. Deterministic (rebuild-byte-identical) like the
    * varint path.
    */
  def encodeColumnarPfor(
      docIds: Array[Long],
      tfs: Array[Int],
      dls: Array[Int],
      n: Int
  ): IndexedSeq[Block] = {
    val out = ArrayBuffer[Block]()
    // reusable per-block scratch (r6): worst case per packed column is the
    // zero-exception layout at w = 64 -> 2 + 8*m bytes (the cost-minimal
    // choice can never exceed it), plus <= 10 bytes for the leading varint
    val buf = new Array[Byte](10 + 3 * (2 + 8 * BlockSize))
    val deltas = new Array[Long](BlockSize)
    val tfl = new Array[Long](BlockSize)
    val dll = new Array[Long](BlockSize)
    var off = 0
    while (off < n) {
      val cnt = math.min(BlockSize, n - off)
      var maxTf = 0
      var minDlOverTf = Double.MaxValue
      var i = 0
      while (i < cnt) {
        val d = docIds(off + i)
        if (i > 0) {
          val delta = d - docIds(off + i - 1)
          require(delta > 0, "postings must be strictly docId-ascending")
          deltas(i - 1) = delta
        }
        val tf = tfs(off + i)
        val dl = dls(off + i)
        tfl(i) = tf.toLong
        dll(i) = dl.toLong
        if (tf > maxTf) maxTf = tf
        val r = dl.toDouble / tf
        if (r < minDlOverTf) minDlOverTf = r
        i += 1
      }
      var pos = putVarLong(buf, 0, docIds(off))
      pos = putPacked(buf, pos, deltas, cnt - 1)
      pos = putPacked(buf, pos, tfl, cnt)
      pos = putPacked(buf, pos, dll, cnt)
      out += Block(docIds(off), docIds(off + cnt - 1), cnt, maxTf, minDlOverTf,
        java.util.Arrays.copyOf(buf, pos), pfor = true)
      off += cnt
    }
    out.toIndexedSeq
  }

  private def decodePrimitivePfor(block: Block): DecodedBlock = {
    val n = block.count
    val r = new ByteReader(block.bytes)
    val docIds = new Array[Long](n)
    docIds(0) = r.readVarLong()
    val deltas = readPacked(r, n - 1)
    var i = 1
    while (i < n) { docIds(i) = docIds(i - 1) + deltas(i - 1); i += 1 }
    val tfl = readPacked(r, n)
    val dll = readPacked(r, n)
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    i = 0
    while (i < n) { tfs(i) = tfl(i).toInt; dls(i) = dll(i).toInt; i += 1 }
    DecodedBlock(docIds, tfs, dls)
  }
}
