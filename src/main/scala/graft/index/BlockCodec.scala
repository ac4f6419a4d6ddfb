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

  /** One encoded block of a posting list. `(maxTf, minDlOverTf)` feed
    * Bm25.partBound — a safe score upper bound under any (idf, avgdl).
    */
  final case class Block(
      minDoc: Long,
      maxDoc: Long,
      count: Int,
      maxTf: Int,
      minDlOverTf: Double,
      bytes: Array[Byte]
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
  def encodeColumnar(
      docIds: Array[Long],
      tfs: Array[Int],
      dls: Array[Int],
      n: Int
  ): IndexedSeq[Block] = {
    val out = ArrayBuffer[Block]()
    var off = 0
    while (off < n) {
      val cnt = math.min(BlockSize, n - off)
      val buf = new ByteArrayOutputStream(cnt * 4)
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
        writeVarLong(buf, delta)
        writeVarLong(buf, tf.toLong)
        writeVarLong(buf, dl.toLong)
        prev = d
        if (tf > maxTf) maxTf = tf
        val r = dl.toDouble / tf
        if (r < minDlOverTf) minDlOverTf = r
        i += 1
      }
      out += Block(docIds(off), docIds(off + cnt - 1), cnt, maxTf, minDlOverTf, buf.toByteArray)
      off += cnt
    }
    out.toIndexedSeq
  }

  /** Columnar decoded form — primitive arrays, no per-posting object. */
  final case class DecodedBlock(docIds: Array[Long], tfs: Array[Int], dls: Array[Int]) {
    def length: Int = docIds.length
  }

  def decodePrimitive(block: Block): DecodedBlock = {
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
    val r = new ByteReader(block.bytes)
    val out = new Array[Posting](block.count)
    var prev = 0L
    var i = 0
    while (i < block.count) {
      val doc = if (i == 0) r.readVarLong() else prev + r.readVarLong()
      val tf = r.readVarLong().toInt
      val dl = r.readVarLong().toInt
      out(i) = Posting(doc, tf, dl)
      prev = doc
      i += 1
    }
    out
  }
}
