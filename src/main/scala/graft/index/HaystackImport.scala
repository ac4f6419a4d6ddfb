package graft.index

import java.io.{BufferedInputStream, DataInputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.JsonMethods

/** Importer for the reference engine's on-disk index format
  * (/root/reference/specs/phase2_persistence.md:44-92) — the one concrete
  * thing a migrating reference user hits on day one: serve an EXISTING
  * Haystack index without re-ingesting the corpus.
  *
  * Layout (all three files required, the directory is the atomic unit):
  *   - index_meta.json : {"schema_version":1,"N":<long>,"avgdl":<double>}
  *   - docs.jsonl      : one {"docId":<long>,"text":<string>} per line,
  *                       docId ascending
  *   - postings.bin    : little-endian (inverted_index.cpp:67-208):
  *                       u64 termCount, then per term — u32 len, UTF-8
  *                       bytes, u32 postingCount, postingCount x
  *                       (i32 docId, i32 tf), docId ascending
  *
  * Import is FORMAT import, not a rebuild: the foreign postings are the
  * ground truth for (tf, dl) — nothing here tokenizes, so result parity
  * holds even for a corpus the two tokenizers would split differently.
  * docs.jsonl supplies the text for snippets/serving only.
  *
  * Scale shape: postings.bin has no skip table, so decoding it is ONE
  * sequential streaming task (the format's inherent constraint — a
  * single-node engine's index is at most node-sized, and the pass is
  * IO-bound decode, never pinned). Everything after the decode is
  * distributed: the (term, doc_id, tf) rows shuffle once into per-doc
  * tfmaps, then flow through the same exchange-free segment write as a
  * fresh build. A one-time migration job pays two extra metadata-sized
  * validation passes for fail-fast integrity (doc count, orphan postings,
  * avgdl agreement) — deliberate: serving a silently-corrupt import is the
  * one unrecoverable outcome.
  */
object HaystackImport {

  private implicit val fmts: Formats = DefaultFormats

  /** The reference format version this importer understands
    * (specs/phase2_persistence.md: schema_version default 1).
    */
  val SupportedSchemaVersion = 1

  final case class HsMeta(schemaVersion: Int, n: Long, avgdl: Double)

  /** Parse index_meta.json, failing fast on missing files or an
    * unsupported schema_version (the spec's goal 6: "fail fast with clear
    * errors if an unsupported version is encountered").
    */
  def readHsMeta(hsDir: String): HsMeta = {
    val p = Paths.get(hsDir, "index_meta.json")
    Seq("index_meta.json", "docs.jsonl", "postings.bin").foreach { f =>
      require(Files.exists(Paths.get(hsDir, f)),
        s"not a haystack index (missing $f): $hsDir")
    }
    val j = JsonMethods.parse(Files.readString(p))
    val sv = (j \ "schema_version").extract[Int]
    require(sv == SupportedSchemaVersion,
      s"unsupported haystack schema_version $sv (supported: $SupportedSchemaVersion): $p")
    HsMeta(sv, (j \ "N").extract[Long], (j \ "avgdl").extract[Double])
  }

  /** postings.bin as a DataFrame (term string, doc_id long, tf int). The
    * decode is one streaming task (see scale note above); rows leave the
    * task as they are read.
    */
  def postingsDF(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(p => parsePostings(p))
      .toDF("term", "doc_id", "tf")
  }

  /** Streaming decoder for the reference's little-endian postings layout.
    * Strict: truncation, a short read, or trailing bytes all throw with the
    * file named (the reference's own load() discipline —
    * inverted_index.cpp:177-208 throws on any short read).
    */
  private[index] def parsePostings(path: String): Iterator[(String, Long, Int)] = {
    val in = new DataInputStream(
      new BufferedInputStream(Files.newInputStream(Paths.get(path)), 1 << 16))
    def fail(msg: String): Nothing = {
      in.close()
      throw new IllegalArgumentException(s"corrupt postings.bin ($msg): $path")
    }
    def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      try in.readFully(b)
      catch { case _: EOFException => fail("truncated") }
      b
    }
    def u32(): Long = {
      val b = bytes(4)
      ((b(0) & 0xffL)) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)
    }
    def u64(): Long = u32() | (u32() << 32)
    val termCount = u64()
    if (termCount < 0) fail(s"negative term count $termCount")

    new Iterator[(String, Long, Int)] {
      private var termsLeft = termCount
      private var term: String = null
      private var postingsLeft = 0L
      private var closed = false

      private def advanceTerm(): Unit = {
        while (postingsLeft == 0 && termsLeft > 0) {
          val len = u32()
          if (len > (1L << 24)) fail(s"implausible term length $len")
          term = new String(bytes(len.toInt), StandardCharsets.UTF_8)
          postingsLeft = u32()
          termsLeft -= 1
          // a term with zero postings is legal in the format; skip it
        }
        if (postingsLeft == 0 && termsLeft == 0 && !closed) {
          if (in.read() != -1) fail("trailing bytes after last term")
          in.close()
          closed = true
        }
      }

      override def hasNext: Boolean = {
        advanceTerm()
        postingsLeft > 0
      }

      override def next(): (String, Long, Int) = {
        if (!hasNext) throw new NoSuchElementException
        val docId = u32().toInt.toLong // i32 docId, sign-preserved
        val tf = u32().toInt
        postingsLeft -= 1
        (term, docId, tf)
      }
    }
  }

  /** Import `hsDir` into a fresh graft segment index at `outDir`. Returns
    * the per-bucket manifests (same contract as [[SegmentIndex.build]]).
    */
  def importIndex(
      spark: SparkSession,
      hsDir: String,
      outDir: String,
      buckets: Int,
      codec: String = BlockCodec.CodecVarint
  ): Seq[SegmentIndex.Manifest] = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val hs = readHsMeta(hsDir)

    // FAILFAST: a torn/garbled docs.jsonl line must abort the import, not
    // silently drop a document. The Phase-2.5 metadata fields
    // (search_service.cpp:368-377: file_name/file_type/source_path/
    // page_number/did_ocr) are optional per row; source_path maps onto the
    // docstore's `source` column so hits keep their citation after
    // migration (the other fields have no docstore home — import is
    // text+postings-lossless, metadata-best-effort, and says so here).
    val docs = spark.read
      .schema("docId LONG, text STRING, file_name STRING, file_type STRING, " +
        "source_path STRING, page_number INT, did_ocr BOOLEAN")
      .option("mode", "FAILFAST")
      .json(s"$hsDir/docs.jsonl")
      .select(
        col("docId").as("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("source_path"), lit("")).as("source"))

    val post = postingsDF(spark, s"$hsDir/postings.bin")
    // sort_array before map_from_entries: collect_list order is
    // shuffle-nondeterministic, and a deterministic docstore keeps the
    // import itself byte-reproducible (segment bytes are already
    // order-independent — the writer sorts terms — but determinism
    // everywhere is the persistence discipline)
    val perDoc = post
      .groupBy(col("doc_id"))
      .agg(
        map_from_entries(sort_array(collect_list(struct(col("term"), col("tf"))))).as("tfmap"),
        // dl stays LONG through the aggregate: each tf is i32, so a doc's
        // total can overflow Int — the fit is checked below and the cast
        // happens only after it passes (ADVICE r5: a silent wrap could
        // cancel in the avgdl cross-check)
        sum(col("tf")).as("dl"))

    // fail-fast integrity (cheap aggregate jobs, see scaladoc):
    val nDocs = docs.count()
    require(nDocs == hs.n,
      s"docs.jsonl has $nDocs docs but index_meta.json says N=${hs.n}: $hsDir")
    val orphans = perDoc.join(docs, Seq("doc_id"), "left_anti").count()
    require(orphans == 0L,
      s"postings.bin references $orphans docIds absent from docs.jsonl: $hsDir")
    // coalesce: an index whose postings.bin has zero terms (all docs empty)
    // sums over zero rows -> NULL. maxDl rides the same aggregate: fail
    // fast on a per-doc token total the docstore's int dl cannot hold,
    // like the other integrity checks.
    val aggRow = perDoc
      .agg(coalesce(sum(col("dl")), lit(0L)), coalesce(max(col("dl")), lit(0L))).head()
    val sumDl = aggRow.getLong(0)
    val maxDl = aggRow.getLong(1)
    require(maxDl <= Int.MaxValue,
      s"a document's total term frequency ($maxDl) exceeds Int range: $hsDir")
    val avgdl = if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs
    require(math.abs(avgdl - hs.avgdl) <= 1e-9 * math.max(1.0, math.abs(hs.avgdl)),
      s"postings imply avgdl=$avgdl but index_meta.json says ${hs.avgdl}: $hsDir")

    val joined = docs
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("text"),
        // source carries the reference's source_path (empty when absent);
        // the format has no language column — stable empty string keeps
        // the docstore schema identical to a native build's
        col("source"),
        lit("").as("lang"),
        coalesce(col("dl"), lit(0)).as("dl"),
        coalesce(col("tfmap"), typedLit(Map.empty[String, Int])).as("tfmap"))

    SegmentIndex.buildFromDlTfmap(joined, outDir, buckets, codec)
  }
}
