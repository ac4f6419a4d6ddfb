package graft.index

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Positional-read document sidecar for the SERVING tier — the fix for the
  * searchd memory model (the reference pins every document's full text in RAM,
  * /root/reference/src/core/search_service.cpp; at 100x corpus the serving
  * node dies at load). One `docs-<bucket>.bin` per docstore bucket, mirroring
  * the v5 segment dictionary design:
  *
  *   magic | bucket | doc records... | dictionary | dictOffset (last 8 bytes)
  *
  * A reader pins ONLY the dictionary — (docId, offset, len), 20 bytes per doc
  * vs kilobytes of text — and serves each requested doc with one positional
  * read (the docstore is doc_id-sorted per bucket, so ids binary-search).
  * Decoded rows go through a bounded byte-capped LRU for hot docs.
  *
  * Sidecars are DERIVED data: generated lazily at server load when missing
  * (one column-pruned pass over the docstore parquet — off the build hot
  * path, so index-build throughput is untouched) and maintained eagerly by
  * addDocuments for delta buckets once an index has them.
  */
object DocSidecar {

  final case class DocRow(text: String, source: String, lang: String)

  private val Magic = "GRFTDOC1".getBytes(StandardCharsets.US_ASCII)

  def sidecarPath(indexDir: String, bucket: Int): Path =
    Paths.get(indexDir, f"docs-$bucket%05d.bin")

  def sidecarFiles(indexDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(indexDir)).iterator().asScala
      .filter(_.getFileName.toString.matches("docs-\\d+\\.bin"))
      .map(_.toString)
      .toSeq
      .sorted
  }

  /** Bucket id encoded in a sidecar file name (docs-NNNNN.bin). */
  def sidecarBucket(file: String): Int =
    Paths.get(file).getFileName.toString.stripPrefix("docs-").stripSuffix(".bin").toInt

  /** Sidecar files of the COMMITTED generation only — dead pre-compaction
    * buckets and crashed-add orphans can leave docs-*.bin droppings on disk
    * (content-identical for dead duplicates, but their overlapping doc-id
    * ranges defeat DocStore's sorted-bucket binary search and pin dead
    * descriptors). Readers enumerate through this, mirroring
    * [[SegmentIndex.liveSegmentFiles]].
    */
  def liveSidecarFiles(indexDir: String, meta: SegmentIndex.Meta): Seq[String] = {
    val live = SegmentIndex.liveBucketSet(meta)
    sidecarFiles(indexDir).filter(f => live(sidecarBucket(f)))
  }

  /** Write sidecars for every docstore bucket missing one (idempotent; safe
    * to call at every server load). Returns the buckets written.
    */
  def ensure(spark: SparkSession, indexDir: String): Seq[Int] = {
    // LIVE buckets only: docstore part-files of a crashed add (bucket >=
    // meta.buckets) or of dead pre-compaction buckets may still be on disk;
    // they are not part of the committed index and get no sidecar
    val live = SegmentIndex.liveBucketSet(SegmentIndex.readMeta(indexDir))
    val buckets = spark.read.parquet(s"$indexDir/docstore")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq.sorted
      .filter(live)
    val missing = buckets.filterNot(b => Files.exists(sidecarPath(indexDir, b)))
    if (missing.isEmpty) Nil else writeBuckets(spark, indexDir, missing)
  }

  /** Write sidecars for exactly `target` buckets (used by addDocuments for
    * the delta buckets and by ensure for the missing set). One column-pruned
    * pass: (bucket, doc_id, text, source, lang), re-co-located per bucket,
    * streamed to `.tmp` + atomic rename — same persistence discipline as
    * segments.
    */
  def writeBuckets(spark: SparkSession, indexDir: String, target: Seq[Int]): Seq[Int] = {
    if (target.isEmpty) return Nil
    val rows = spark.read.parquet(s"$indexDir/docstore")
      .filter(col("bucket").isInCollection(target))
      .select(col("bucket"), col("doc_id"), col("text"), col("source"), col("lang"))
      .repartition(target.size, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
    val out = indexDir
    rows.mapPartitions(it => writePartition(it, out))(Encoders.scalaInt)
      .collect().toSeq.sorted
  }

  /** Stream one shuffle partition (sorted by bucket, doc_id; possibly several
    * buckets per partition under hash collisions) into one sidecar per bucket.
    */
  private def writePartition(it: Iterator[Row], indexDir: String): Iterator[Int] = {
    val written = scala.collection.mutable.ArrayBuffer[Int]()
    val buffered = it.buffered
    while (buffered.hasNext) {
      val bucket = buffered.head.getInt(0)
      val file = sidecarPath(indexDir, bucket)
      val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
      val fos = new FileOutputStream(tmp.toFile)
      val counting = new CountingStream(new BufferedOutputStream(fos, 1 << 16))
      val out = new DataOutputStream(counting)
      val dict = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      try {
        out.write(Magic)
        out.writeInt(bucket)
        while (buffered.hasNext && buffered.head.getInt(0) == bucket) {
          val r = buffered.next()
          val off = counting.count
          writeStr(out, r.getString(2)) // text (int length — no 64 KiB cap)
          writeStr(out, r.getString(3)) // source
          writeStr(out, r.getString(4)) // lang
          dict += ((r.getLong(1), off, (counting.count - off).toInt))
        }
        val dictOffset = counting.count
        out.writeInt(dict.length)
        dict.foreach { case (id, off, len) =>
          out.writeLong(id); out.writeLong(off); out.writeInt(len)
        }
        out.writeLong(dictOffset)
        out.flush()
        fos.getFD.sync()
      } finally out.close()
      Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      written += bucket
    }
    written.iterator
  }

  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = (if (s == null) "" else s).getBytes(StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }

  private final class CountingStream(os: java.io.OutputStream)
      extends java.io.FilterOutputStream(os) {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
  }

  // -------------------------------------------------------------------- read

  /** One bucket's pinned dictionary + open channel for positional reads. */
  final class BucketReader private[DocSidecar] (
      val bucket: Int,
      path: String,
      ch: java.nio.channels.FileChannel,
      val docIds: Array[Long],
      offsets: Array[Long],
      lens: Array[Int]
  ) {
    def minDoc: Long = if (docIds.isEmpty) Long.MaxValue else docIds(0)
    def maxDoc: Long = if (docIds.isEmpty) Long.MinValue else docIds(docIds.length - 1)

    def get(docId: Long): Option[DocRow] = {
      val i = java.util.Arrays.binarySearch(docIds, docId)
      if (i < 0) return None
      val buf = java.nio.ByteBuffer.allocate(lens(i))
      var p = offsets(i)
      while (buf.hasRemaining) {
        val n = ch.read(buf, p)
        require(n >= 0, s"unexpected EOF in $path at $p")
        p += n
      }
      buf.flip()
      Some(DocRow(readStr(buf), readStr(buf), readStr(buf)))
    }

    private def readStr(buf: java.nio.ByteBuffer): String = {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      new String(b, StandardCharsets.UTF_8)
    }

    /** Pinned dictionary footprint (what the serving node actually holds). */
    def pinnedBytes: Long = docIds.length.toLong * 20

    def close(): Unit = ch.close()
  }

  /** Diagnostic: sidecar bucket opens performed by this JVM. */
  val bucketOpens = new java.util.concurrent.atomic.AtomicLong(0)

  def openBucket(path: String): BucketReader = {
    bucketOpens.incrementAndGet()
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(path), java.nio.file.StandardOpenOption.READ)
    try {
      val size = ch.size()
      def readAt(pos: Long, len: Int): java.nio.ByteBuffer = {
        val buf = java.nio.ByteBuffer.allocate(len)
        var p = pos
        while (buf.hasRemaining) {
          val n = ch.read(buf, p)
          require(n >= 0, s"unexpected EOF in $path at $p")
          p += n
        }
        buf.flip(); buf
      }
      val head = readAt(0, Magic.length + 4)
      val magic = new Array[Byte](Magic.length)
      head.get(magic)
      require(java.util.Arrays.equals(magic, Magic), s"bad sidecar magic in $path")
      val bucket = head.getInt
      val dictOffset = readAt(size - 8, 8).getLong
      val dict = readAt(dictOffset, (size - 8 - dictOffset).toInt)
      val n = dict.getInt
      val ids = new Array[Long](n)
      val offs = new Array[Long](n)
      val lens = new Array[Int](n)
      var i = 0
      while (i < n) { ids(i) = dict.getLong; offs(i) = dict.getLong; lens(i) = dict.getInt; i += 1 }
      new BucketReader(bucket, path, ch, ids, offs, lens)
    } catch { case t: Throwable => ch.close(); throw t }
  }

  /** Serving-tier doc store over all of an index's sidecars: routes a docId
    * to its bucket (ranges are doc_id-range partitioned, binary search),
    * positional-reads the record, and keeps hot docs in a byte-capped LRU.
    * Thread-safe: positional channel reads + a STRIPED LRU — 16 independent
    * synchronized shards keyed by docId, each with 1/16 of the byte cap, so
    * 50 concurrent clients doing ~10 lookups per request don't all funnel
    * through one monitor (a single global lock serializes every get AND
    * every fill at thousands of requests per second).
    */
  final class DocStore(readers: IndexedSeq[BucketReader], cacheCapBytes: Long) {
    private val byMin = readers.sortBy(_.minDoc).toArray
    private val mins = byMin.map(_.minDoc)
    // every writer path range-partitions by doc_id, so bucket ranges are
    // disjoint; if a hand-built index violates that, fall back to probing all
    private val overlapping =
      byMin.length > 1 && byMin.sliding(2).exists(p => p(0).maxDoc >= p(1).minDoc)

    private val Stripes = 16 // power of two
    private final class Shard(capBytes: Long) {
      val lru = new java.util.LinkedHashMap[java.lang.Long, DocRow](256, 0.75f, true)
      var bytes = 0L
      def get(docId: Long): DocRow = lru.synchronized(lru.get(docId))
      def put(docId: Long, r: DocRow): Unit = {
        // a row larger than this shard's whole cap can never be retained —
        // inserting it would just evict every other hot doc in the shard and
        // then itself (cache thrash); serve oversized docs straight from the
        // positional read instead
        if (rowBytes(r) > capBytes) return
        lru.synchronized {
          if (lru.put(docId, r) == null) bytes += rowBytes(r)
          val it = lru.entrySet().iterator()
          while (bytes > capBytes && it.hasNext) {
            val e = it.next()
            bytes -= rowBytes(e.getValue)
            it.remove()
          }
        }
      }
    }
    private val shards =
      Array.fill(Stripes)(new Shard(math.max(1L, cacheCapBytes / Stripes)))
    // doc ids are dense and ascending, so low bits alone distribute evenly;
    // mix the high word anyway for replicated/bench id patterns
    private def shardOf(docId: Long): Shard =
      shards(((docId ^ (docId >>> 32)).toInt) & (Stripes - 1))
    private def rowBytes(r: DocRow): Long =
      2L * (r.text.length + r.source.length + r.lang.length) + 64

    def get(docId: Long): Option[DocRow] = {
      val shard = shardOf(docId)
      val hit = shard.get(docId)
      if (hit != null) return Some(hit)
      var i = java.util.Arrays.binarySearch(mins, docId)
      if (i < 0) i = -i - 2 // last bucket with minDoc <= docId
      var found: Option[DocRow] =
        if (i >= 0 && docId <= byMin(i).maxDoc) byMin(i).get(docId) else None
      if (found.isEmpty && overlapping)
        found = byMin.iterator
          .filter(r => r.minDoc <= docId && docId <= r.maxDoc)
          .flatMap(_.get(docId))
          .nextOption()
      found.foreach(shard.put(docId, _))
      found
    }

    def nDocs: Long = readers.map(_.docIds.length.toLong).sum
    def pinnedBytes: Long = readers.map(_.pinnedBytes).sum
    def close(): Unit = readers.foreach(_.close())
  }

  /** Open the index's sidecar-backed doc store; None when no sidecars exist
    * (caller backfills via ensure()).
    */
  def openStore(indexDir: String, cacheCapBytes: Long = 64L << 20): Option[DocStore] = {
    val files = liveSidecarFiles(indexDir, SegmentIndex.readMeta(indexDir))
    if (files.isEmpty) None
    else Some(new DocStore(files.map(openBucket).toIndexedSeq, cacheCapBytes))
  }
}
