package graft.search

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, sum}
import scala.collection.parallel.CollectionConverters._

import graft.core.{Bm25, ParsedQuery, Phrase, QueryParser, Tokenizer}
import graft.index.{DocSidecar, SegmentIndex}
import graft.index.SegmentIndex.LoadedSegment

/** Query serving over on-disk segments (the scale path / EP2).
  *
  * Batch mode (how QPS is measured): queries are broadcast, segments are a
  * Dataset of file paths fanned out over executors; each task loads (or hits
  * the executor-local cache of) its segments and runs block-max WAND locally;
  * per-(query, segment) top-k heaps come back — k+slack rows per query per
  * segment, NOT candidate sets — and the driver merges with the reference's
  * epsilon comparator. No shuffle on the query path at all.
  *
  * In-memory mode: all segments pinned in the JVM (the searchd serving model)
  * for single-query latency benchmarks.
  */
object SegmentSearch {

  /** Executor-local segment cache — one load per (executor, file) across all
    * queries and jobs in the JVM.
    */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LoadedSegment]()

  /** Driver-side global-df cache, keyed by index state (dir, n, sumDl,
    * segment-file fingerprint).
    */
  @transient private lazy val dfCaches =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Long, Long, String), java.util.concurrent.ConcurrentHashMap[String, Long]]()

  /** Executor-local load-once per segment FILE IDENTITY — the key includes
    * size+mtime so an in-place rebuild of the same path (resume invalidation,
    * changed corpus) is re-loaded instead of served stale; superseded entries
    * for the same path are evicted.
    */
  def loadCached(path: String): LoadedSegment = {
    val p = java.nio.file.Paths.get(path)
    val key = s"$path|${java.nio.file.Files.size(p)}|${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
    val hit = cache.get(key)
    if (hit != null) return hit
    val keys = cache.keys()
    while (keys.hasMoreElements) { // drop superseded versions of this path
      val k = keys.nextElement()
      if (k.startsWith(path + "|") && k != key) {
        // Close the evicted segment's lazy FileChannel — long-lived executors
        // must not leak a descriptor per superseded segment. A task racing an
        // in-place rebuild of the same path may see a ClosedChannelException
        // and retry — loud and correct (the bytes under it changed anyway).
        val old = cache.remove(k)
        if (old != null) old.close()
      }
    }
    // lazy: executor tasks read the term dictionary only; posting records
    // load on demand for the query terms that actually hit this segment
    cache.computeIfAbsent(key, _ => SegmentIndex.loadSegment(path, eager = false))
  }

  /** Executor-local sidecar reader cache (phrase batch verification), same
    * file-identity key + superseded-version eviction discipline as
    * `loadCached`. A reader pins 20 B/doc (dictionary only); text rows are
    * positional reads.
    */
  @transient private lazy val sidecarCache =
    new java.util.concurrent.ConcurrentHashMap[String, DocSidecar.BucketReader]()

  def loadCachedSidecar(path: String): DocSidecar.BucketReader = {
    val p = java.nio.file.Paths.get(path)
    val key = s"$path|${java.nio.file.Files.size(p)}|${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
    val hit = sidecarCache.get(key)
    if (hit != null) return hit
    val keys = sidecarCache.keys()
    while (keys.hasMoreElements) {
      val k = keys.nextElement()
      if (k.startsWith(path + "|") && k != key) {
        val old = sidecarCache.remove(k)
        if (old != null) old.close() // loud ClosedChannelException on racers, like segments
      }
    }
    sidecarCache.computeIfAbsent(key, _ => DocSidecar.openBucket(path))
  }

  /** Segment-file fan-out Dataset: files sliced straight into tasks via
    * `parallelize(files, n)` — r6: the old `createDataset(...).repartition(n)`
    * paid a full Exchange stage (map + fetch) in EVERY batch job before any
    * search work started. Slice count keeps the one-segment-per-task
    * granularity up to 4x core count (straggler rebalance), grouping only
    * past that.
    */
  private def segmentFileDs(
      spark: SparkSession,
      files: Seq[String]
  ): org.apache.spark.sql.Dataset[String] = {
    val n = math.max(1, math.min(files.size, 4 * spark.sparkContext.defaultParallelism))
    spark.createDataset(spark.sparkContext.parallelize(files, n))(Encoders.STRING)
  }

  final case class QueryHit(qid: Int, docId: Long, score: Double)

  /** The ONE did-you-mean pick rule (the oracle contract shared by all
    * tiers): exact presence wins; else argmax global df with byte-lex tie;
    * else the term itself with df 0. `cands` are (candidate, global df)
    * pairs already verified within the edit-distance radius of `t`.
    */
  private[search] def pickSuggestion(t: String, cands: Iterable[(String, Long)]): (String, Long) = {
    val cs = cands.toSeq
    cs.find(_._1 == t)
      .orElse(cs.reduceOption((a, b) => if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a))
      .getOrElse((t, 0L))
  }

  /** Global idf per positive query term from IN-MEMORY segments: global df =
    * sum of per-segment local dfs (the Lucene sharding model — lets segments
    * be appended incrementally without rewriting stats into old files).
    */
  def globalIdfs(
      segments: Seq[LoadedSegment],
      n: Long,
      terms: Seq[String]
  ): Map[String, Double] =
    terms.distinct.flatMap { t =>
      val df = segments.iterator.flatMap(_.terms.get(t)).map(_.df).sum
      if (df > 0) Some(t -> Bm25.idf(n, df)) else None
    }.toMap

  /** Distributed batch search: all queries against all segments.
    * Returns per query the reference-ranked top-k (epsilon comparator).
    *
    * Phase 1 (tiny): sum per-segment local dfs for the batch's query terms —
    * |terms| x |segments| rows collected, and it warms the executor segment
    * caches for phase 2. Phase 2: zero-shuffle WAND fan-out + distributed
    * per-query merge.
    */
  def searchBatch(
      spark: SparkSession,
      indexDir: String,
      queries: Seq[String],
      k: Int
  ): Map[Int, Seq[(Long, Double)]] =
    searchBatchParsed(spark, indexDir,
      queries.zipWithIndex.map { case (q, i) => (i, QueryParser.parse(q)) }, k)

  private def searchBatchParsed(
      spark: SparkSession,
      indexDir: String,
      parsed: Seq[(Int, ParsedQuery)],
      k: Int
  ): Map[Int, Seq[(Long, Double)]] = {
    val meta = SegmentIndex.readMeta(indexDir)
    val files = SegmentIndex.liveSegmentFiles(indexDir, meta)
    val avgdl = meta.avgdl

    import spark.implicits._
    // one segment per task (up to 4x core count): finer granularity than
    // segments-per-core shortens the straggler tail — with 2 segments/task a
    // single slow pair doubles the stage wall; single-segment tasks let the
    // scheduler rebalance
    val fileDs = segmentFileDs(spark, files)

    val idfs = batchIdfs(spark, indexDir, meta, files, fileDs, parsed.flatMap(_._2.terms).distinct)
    val bc = spark.sparkContext.broadcast((parsed, idfs))

    val queryDiag = sys.env.get("SPARK_GRAFT_QUERY_DIAG").contains("1")
    val hits = fileDs
      .mapPartitions { paths =>
        val (qs, idfMap) = bc.value
        paths.flatMap { p =>
          val t0 = if (queryDiag) System.nanoTime() else 0L
          val seg = loadCached(p)
          val out = qs.iterator.flatMap { case (qid, pq) =>
            Wand.searchSegment(seg, pq, idfMap, avgdl, k).iterator
              .map(h => QueryHit(qid, h.docId, h.score))
          }
          if (!queryDiag) out
          else {
            val buf = out.toVector // force, so the timing covers the search
            System.err.println(f"[qdiag] ${p.split('/').last}%-18s ${(System.nanoTime() - t0) / 1e6}%8.1f ms  thread=${Thread.currentThread().getName}")
            buf.iterator
          }
        }
      }(Encoders.product[QueryHit])

    mergeDistributed(hits, parsed.size, k)
  }

  /** Distributed did-you-mean — completes its three-tier story (dataflow
    * `SearchEngine.didYouMeanDF`, serving `ServingEngine.didYouMean`): one
    * distributed pass over per-segment dictionaries collects the
    * Levenshtein<=maxDist candidates WITH their local dfs (length-band
    * pre-check before the DP; only matched (term, df) rows leave the
    * executors), dfs sum across segments driver-side, then the shared pick
    * rule: exact presence wins, else argmax global df (ties byte-lex), else
    * the term itself with df 0. Output rows: (pos, term, suggestion, df).
    */
  def didYouMeanBatch(
      spark: SparkSession,
      indexDir: String,
      query: String,
      maxDist: Int = 1
  ): Seq[(Long, String, String, Long)] = {
    val terms = QueryParser.parse(query).terms
    if (terms.isEmpty) return Nil
    val tset = terms.distinct
    val files = SegmentIndex.liveSegmentFiles(indexDir)
    // Zero live segments (empty corpus / streaming dir before first commit):
    // every term falls through to (itself, df 0) — same as the serving tier.
    if (files.isEmpty) return terms.zipWithIndex.map { case (t, i) => (i + 1L, t, t, 0L) }
    import spark.implicits._
    val tbc = spark.sparkContext.broadcast(tset)
    val dfs: Map[String, Long] = segmentFileDs(spark, files)
      .mapPartitions { paths =>
        val ts = tbc.value
        paths.flatMap { p =>
          loadCached(p).terms.iterator.collect {
            case (cand, td) if ts.exists(t =>
              math.abs(cand.length - t.length) <= maxDist &&
                graft.core.EditDistance.within(cand, t, maxDist)) => (cand, td.df)
          }
        }
      }(Encoders.product[(String, Long)])
      .toDF("term", "df")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.zipWithIndex.map { case (t, i) =>
      val pick = pickSuggestion(t,
        dfs.view.filter { case (cand, _) => graft.core.EditDistance.within(cand, t, maxDist) })
      (i + 1L, t, pick._1, pick._2)
    }
  }

  /** Expansion descriptor for the batch tier's dictionary-expanded query
    * family (prefix / wildcard / fuzzy) — serialized into the expansion
    * task; normalization happens driver-side before construction.
    */
  private sealed trait Expansion extends Serializable
  private final case class PrefixExp(p: String) extends Expansion
  private final case class WildExp(glob: String) extends Expansion
  private final case class FuzzyExp(t: String, maxDist: Int) extends Expansion

  /** Distributed batch twins of the serving tier's expanded queries —
    * completes the three-tier matrix for prefix/wildcard/fuzzy (SURVEY
    * §2.12/§2.15). Phase 0: expand the pattern against per-segment
    * dictionaries IN PARALLEL — vocabulary never leaves the executors, only
    * matched terms come back (a vocabulary-bounded, usually tiny list).
    * The byte-lex-sorted union then scores OR-mode through the normal
    * searchBatch machinery (global df = sum of local dfs, WAND, distributed
    * merge) — identical semantics to the dataflow and serving tiers, so all
    * three answer the same oracle SQL.
    */
  def prefixBatch(spark: SparkSession, indexDir: String, prefix: String, k: Int): Seq[(Long, Double)] = {
    val norm = Tokenizer.tokenize(prefix)
    if (norm.size != 1) return Nil
    expansionBatch(spark, indexDir, PrefixExp(norm.head), k)
  }

  def wildcardBatch(spark: SparkSession, indexDir: String, pattern: String, k: Int): Seq[(Long, Double)] =
    graft.core.Glob.normalize(pattern) match {
      case None => Nil
      case Some(g) => expansionBatch(spark, indexDir, WildExp(g), k)
    }

  def fuzzyBatch(spark: SparkSession, indexDir: String, term: String, k: Int, maxDist: Int = 1): Seq[(Long, Double)] = {
    val norm = Tokenizer.tokenize(term)
    if (norm.size != 1) return Nil
    expansionBatch(spark, indexDir, FuzzyExp(norm.head, maxDist), k)
  }

  private def expansionBatch(
      spark: SparkSession,
      indexDir: String,
      exp: Expansion,
      k: Int
  ): Seq[(Long, Double)] = {
    val files = SegmentIndex.liveSegmentFiles(indexDir)
    if (files.isEmpty) return Nil // repartition(0) would throw on an empty index
    import spark.implicits._
    val expanded = segmentFileDs(spark, files)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val dict = loadCached(p).terms
          exp match {
            case PrefixExp(pre) => dict.keysIterator.filter(_.startsWith(pre))
            case WildExp(g) => dict.keysIterator.filter(graft.core.Glob.matches(g, _))
            case FuzzyExp(t, d) => dict.keysIterator.filter(c =>
              math.abs(c.length - t.length) <= d && graft.core.EditDistance.within(c, t, d))
          }
        }
      }(Encoders.STRING)
      .collect() // matched terms only — vocabulary-bounded, dedup driver-side
      .distinct.sorted.toSeq
    if (expanded.isEmpty) Nil
    else searchBatchParsed(spark, indexDir,
      Seq(0 -> ParsedQuery(expanded, Nil, isOr = true)), k)(0)
  }

  final case class RankedHit(qid: Int, rank: Int, docId: Long, score: Double)

  /** Phase 1 of a batch: global df (sum of per-segment local dfs) for the
    * batch's positive terms. Results are cached per INDEX STATE — (dir, n,
    * sumDl) plus a fingerprint of the segment files' (name, size, mtime),
    * so any add/compact/in-place rebuild (even one that happens to preserve
    * n and sumDl) changes the key. Repeated batches against a warm index
    * skip the job entirely.
    */
  private def batchIdfs(
      spark: SparkSession,
      indexDir: String,
      meta: SegmentIndex.Meta,
      files: Seq[String],
      fileDs: org.apache.spark.sql.Dataset[String],
      allTerms: Seq[String]
  ): Map[String, Double] = {
    val filesFp = SegmentIndex.sha256Hex(
      files.map { f =>
        val p = java.nio.file.Paths.get(f)
        s"$f|${java.nio.file.Files.size(p)}|${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
      }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val cacheKey = (indexDir, meta.n, meta.sumDl, filesFp)
    val dfCache = dfCaches.computeIfAbsent(
      cacheKey, _ => new java.util.concurrent.ConcurrentHashMap[String, Long]())
    val missing = allTerms.filterNot(dfCache.containsKey)
    if (missing.nonEmpty) {
      val tbc = spark.sparkContext.broadcast(missing)
      val found = fileDs
        .mapPartitions { paths =>
          paths.flatMap { p =>
            val seg = loadCached(p)
            tbc.value.iterator.flatMap(t => seg.terms.get(t).map(td => (t, td.df)))
          }
        }(Encoders.product[(String, Long)])
        .collect()
        .groupBy(_._1)
        .map { case (t, v) => t -> v.map(_._2).sum }
      missing.foreach(t => dfCache.put(t, found.getOrElse(t, 0L)))
    }
    allTerms.flatMap { t =>
      val df = dfCache.get(t)
      if (df > 0) Some(t -> Bm25.idf(meta.n, df)) else None
    }.toMap
  }

  /** Per-query merge runs DISTRIBUTED (one group per query, epsilon
    * comparator inside) so the driver collects only nQueries * k final rows
    * — a driver-side merge would grow with segment count and anti-scale.
    */
  private def mergeDistributed(
      hits: org.apache.spark.sql.Dataset[QueryHit],
      nQueries: Int,
      k: Int
  ): Map[Int, Seq[(Long, Double)]] = {
    val kk = k
    val merged = hits
      .groupByKey(_.qid)(Encoders.scalaInt)
      .flatMapGroups { (qid, it) =>
        Bm25.sortHits(it.map(h => (h.docId, h.score)).toIndexedSeq)
          .take(kk)
          .zipWithIndex
          .map { case ((d, s), i) => RankedHit(qid, i + 1, d, s) }
          .iterator
      }(Encoders.product[RankedHit])
      .collect()

    val byQ = merged.groupBy(_.qid)
    (0 until nQueries).map { qid =>
      qid -> byQ.getOrElse(qid, Array.empty[RankedHit]).sortBy(_.rank).map(h => (h.docId, h.score)).toSeq
    }.toMap
  }

  /** Distributed PHRASE batch over on-disk segments — the batch scale path
    * of the phrase extension (SURVEY §2.12). Per segment task: enumerate the
    * FULL AND intersection of the phrase's terms (unbounded k — adjacency
    * filtering must precede truncation for exact top-k), then verify
    * adjacency against the segment's sibling doc sidecar (positional reads,
    * executor-locally cached, 20 B/doc pinned) and emit only verified hits.
    * Zero shuffle on the search side; the only exchange is the
    * nQueries-group distributed merge — identical to `searchBatch`.
    */
  def phraseBatch(
      spark: SparkSession,
      indexDir: String,
      phrases: Seq[String],
      k: Int
  ): Map[Int, Seq[(Long, Double)]] = {
    val meta = SegmentIndex.readMeta(indexDir)
    DocSidecar.ensure(spark, indexDir) // idempotent; sidecars are derived data
    val files = SegmentIndex.liveSegmentFiles(indexDir, meta)
    val parsed: Seq[(Int, IndexedSeq[String])] =
      phrases.zipWithIndex.map { case (p, i) => (i, Tokenizer.tokenize(p).toIndexedSeq) }
    val avgdl = meta.avgdl

    import spark.implicits._
    val fileDs = segmentFileDs(spark, files)

    val idfs = batchIdfs(spark, indexDir, meta, files, fileDs, parsed.flatMap(_._2).distinct)
    val bc = spark.sparkContext.broadcast((parsed, idfs))

    val hits = fileDs
      .mapPartitions { paths =>
        val (qs, idfMap) = bc.value
        paths.flatMap { p =>
          val seg = loadCached(p)
          // sibling sidecar: swap only the FILENAME prefix (a dir component
          // containing "segment-" must not be rewritten)
          lazy val sidecar = loadCachedSidecar {
            val sp = java.nio.file.Paths.get(p)
            sp.resolveSibling(sp.getFileName.toString.replace("segment-", "docs-")).toString
          }
          qs.iterator.flatMap { case (qid, terms) =>
            if (terms.isEmpty) Iterator.empty
            else {
              val pq = ParsedQuery(terms, Nil, isOr = false)
              val raw = Wand.searchSegment(seg, pq, idfMap, avgdl, Int.MaxValue)
              // verify IN SEGMENT-RANK ORDER with early exit at k verified:
              // any global top-k phrase hit living in this segment is among
              // the segment's first k verified hits, so the merge stays
              // exact while text reads drop from O(candidates) to ~k per
              // segment for selective phrases
              Bm25.sortHits(raw.map(h => (h.docId, h.score))).iterator
                .filter { case (d, _) => sidecar.get(d).exists(r => Phrase.containsPhrase(r.text, terms)) }
                .take(if (k == Int.MaxValue) Int.MaxValue else math.max(1, k))
                .map { case (d, s) => QueryHit(qid, d, s) }
            }
          }
        }
      }(Encoders.product[QueryHit])

    mergeDistributed(hits, phrases.size, k)
  }

  /** Distributed prefix suggestions over on-disk segments — EXTENSION
    * (deferred Phase 9 "autocomplete"), the batch twin of
    * `ServingEngine.suggest`. Per segment task: scan the (pinned, vocab-sized)
    * dictionary for prefix matches and emit (term, LOCAL df); global df = sum
    * over segments (the Lucene model), aggregated with map-side combine —
    * the only shuffled rows are per-(segment, matching-term) partials, and
    * the top-k runs as TakeOrderedAndProject (no global sort, the driver
    * receives k rows).
    */
  def suggestBatch(
      spark: SparkSession,
      indexDir: String,
      prefix: String,
      k: Int
  ): Seq[(String, Long)] = {
    val norm = Tokenizer.tokenize(prefix)
    if (norm.size != 1) return Nil
    val p = norm.head
    val files = SegmentIndex.liveSegmentFiles(indexDir)
    import spark.implicits._
    segmentFileDs(spark, files)
      .mapPartitions { paths =>
        paths.flatMap { f =>
          loadCached(f).terms.iterator.collect {
            case (t, td) if t.startsWith(p) => (t, td.df)
          }
        }
      }(Encoders.product[(String, Long)])
      .toDF("term", "df")
      .groupBy("term")
      .agg(org.apache.spark.sql.functions.sum("df").as("df"))
      .orderBy(org.apache.spark.sql.functions.col("df").desc,
               org.apache.spark.sql.functions.col("term").asc)
      .limit(k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
  }

  /** Distributed metadata-filtered batch search — EXTENSION (deferred Phase 9
    * "filters"), the batch twin of `ServingEngine.searchFiltered`. Per
    * segment task: full enumeration (k unbounded — the filter must precede
    * truncation for exact top-k), then the metadata predicate is verified
    * against the segment's sibling doc sidecar IN RANK ORDER with early exit
    * at k accepted (exact per segment because the filter only filters; the
    * cross-segment merge stays exact because any global top-k survivor in
    * this segment is among its first k survivors). Identical shape to
    * `phraseBatch` with a metadata predicate instead of adjacency.
    */
  def searchFilteredBatch(
      spark: SparkSession,
      indexDir: String,
      queries: Seq[String],
      k: Int,
      lang: Option[String],
      source: Option[String]
  ): Map[Int, Seq[(Long, Double)]] = {
    val meta = SegmentIndex.readMeta(indexDir)
    DocSidecar.ensure(spark, indexDir)
    val files = SegmentIndex.liveSegmentFiles(indexDir, meta)
    val parsed: Seq[(Int, ParsedQuery)] =
      queries.zipWithIndex.map { case (q, i) => (i, QueryParser.parse(q)) }
    val avgdl = meta.avgdl

    import spark.implicits._
    val fileDs = segmentFileDs(spark, files)

    val idfs = batchIdfs(spark, indexDir, meta, files, fileDs, parsed.flatMap(_._2.terms).distinct)
    val bc = spark.sparkContext.broadcast((parsed, idfs, lang, source))

    val hits = fileDs
      .mapPartitions { paths =>
        val (qs, idfMap, wantLang, wantSource) = bc.value
        paths.flatMap { p =>
          val seg = loadCached(p)
          lazy val sidecar = loadCachedSidecar {
            val sp = java.nio.file.Paths.get(p)
            sp.resolveSibling(sp.getFileName.toString.replace("segment-", "docs-")).toString
          }
          def accept(d: Long): Boolean = sidecar.get(d).exists { r =>
            wantLang.forall(_ == r.lang) && wantSource.forall(_ == r.source)
          }
          qs.iterator.flatMap { case (qid, pq) =>
            val raw = Wand.searchSegment(seg, pq, idfMap, avgdl, Int.MaxValue)
            Bm25.sortHits(raw.map(h => (h.docId, h.score))).iterator
              .filter { case (d, _) => accept(d) }
              .take(if (k == Int.MaxValue) Int.MaxValue else math.max(1, k))
              .map { case (d, s) => QueryHit(qid, d, s) }
          }
        }
      }(Encoders.product[QueryHit])

    mergeDistributed(hits, queries.size, k)
  }

  /** Same batch contract served from pre-loaded in-memory segments (no Spark
    * job — the reference's HTTP serving model, for latency/QPS benchmarks on
    * a warmed index). Parallelism = one task per segment via parallel
    * collections.
    */
  def searchBatchInMemory(
      segments: Seq[LoadedSegment],
      meta: SegmentIndex.Meta,
      queries: Seq[String],
      k: Int
  ): Map[Int, Seq[(Long, Double)]] = {
    val parsed = queries.zipWithIndex.map { case (q, i) => (i, QueryParser.parse(q)) }
    val idfs = globalIdfs(segments, meta.n, parsed.flatMap(_._2.terms))
    val thetas = parsed.map { case (qid, _) => qid -> new Wand.SharedTheta }.toMap
    val hits = segments.par
      .flatMap { seg =>
        parsed.flatMap { case (qid, pq) =>
          Wand.searchSegment(seg, pq, idfs, meta.avgdl, k, thetas(qid))
            .map(h => QueryHit(qid, h.docId, h.score))
        }
      }
      .seq
      .toArray
    mergeHits(hits, queries.size, k)
  }

  /** EP2 step 7: decorate one query's ranked top-k with snippets from the
    * docstore parquet (doc_id pushdown prunes row groups — the store is
    * doc_id-range sorted).
    */
  def searchWithSnippets(
      spark: SparkSession,
      indexDir: String,
      query: String,
      k: Int
  ): Seq[Hit] = {
    val top = searchBatch(spark, indexDir, Seq(query), k)(0)
    if (top.isEmpty) return Nil
    val ids = top.map(_._1)
    val pq = QueryParser.parse(query)
    val rows = spark.read
      .parquet(s"$indexDir/docstore")
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(ids: _*))
      .select("doc_id", "text", "source", "lang")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    top.map { case (id, s) =>
      val (text, source, lang) = rows.getOrElse(id, ("", "", ""))
      Hit(id, s, graft.core.Snippets.makeSnippet(text, pq.terms), source, lang)
    }
  }

  /** Long-lived in-memory serving engine (the searchd model): segments
    * pinned, per-term global idf cached across requests, and — for the dense
    * queries that dominate tail latency — segments scored IN PARALLEL within
    * one request on the shared ForkJoin pool (work-stealing keeps total
    * parallelism bounded under concurrent clients). One instance serves the
    * HTTP endpoint and the latency benchmarks.
    */
  final class ServingEngine(
      val segments: IndexedSeq[LoadedSegment],
      val meta: SegmentIndex.Meta,
      parallelSegments: Boolean = true,
      // deletion-index depth for the fuzzy family: 1 (default) answers
      // maxDist=1 without a vocab scan; 2 (opt-in per generation — r6,
      // VERDICT r5 #5 — ~5-6x the depth-1 index memory) extends that to
      // maxDist=2. Radii past the depth fall back to the dictionary scan.
      symspellDepth: Int = 1
  ) {
    private val idfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
    // SymSpell deletion neighborhood (SURVEY §2.14's 100 TB shape for the
    // fuzzy family): built once per serving generation, and ONLY when the
    // first fuzzy/did-you-mean request arrives (lazy) — per-request cost is
    // then O(|term|^depth) probes + the verified candidate set, not O(vocab)
    private lazy val symspell: SymSpell =
      SymSpell.build(segments.iterator.flatMap(_.terms.keysIterator), symspellDepth)
    // Byte-lex-sorted global vocabulary — the in-memory twin of the v5
    // dictionary footer's on-disk sort order: prefix expansion and suggest
    // become an O(log V) binary search + an O(|matches|) range walk instead
    // of an O(V) scan per request (the "production tier can range-scan"
    // note SURVEY §2.12/§2.16 carried since round 4). Built lazily once per
    // serving generation, only when a prefix-family request arrives.
    private lazy val sortedVocab: Array[String] = {
      val set = new java.util.HashSet[String]()
      segments.foreach(_.terms.keysIterator.foreach(set.add))
      val arr = set.toArray(new Array[String](set.size))
      java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
      arr
    }

    /** All vocabulary terms with `p` as prefix, byte-lex ascending — the
      * sorted-dictionary range scan.
      */
    private def prefixRange(p: String): Seq[String] = {
      val v = sortedVocab
      var lo = java.util.Arrays.binarySearch(v.asInstanceOf[Array[AnyRef]], p)
      if (lo < 0) lo = -lo - 1
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = lo
      while (i < v.length && v(i).startsWith(p)) { out += v(i); i += 1 }
      out.toSeq
    }

    // Reversed-term dictionary (r6, VERDICT r5 #4): every vocab term
    // REVERSED, sorted — a `*bar` request becomes a range scan on `rab`
    // instead of an O(vocab) walk per request. Built lazily once per
    // serving generation (the SymSpell discipline), only when the first
    // leading-wildcard request arrives; memory = one extra String per term.
    private lazy val reversedVocab: Array[String] = {
      val v = sortedVocab
      val arr = new Array[String](v.length)
      var i = 0
      while (i < v.length) { arr(i) = v(i).reverse; i += 1 }
      java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
      arr
    }

    /** All vocabulary terms whose REVERSED form has `rp` as prefix (i.e.
      * terms ending with rp.reverse), returned in the reversed dictionary's
      * order — callers needing byte-lex order sort the (small) match set.
      */
    private def suffixRange(rp: String): Seq[String] = {
      val v = reversedVocab
      var lo = java.util.Arrays.binarySearch(v.asInstanceOf[Array[AnyRef]], rp)
      if (lo < 0) lo = -lo - 1
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = lo
      while (i < v.length && v(i).startsWith(rp)) { out += v(i).reverse; i += 1 }
      out.toSeq
    }
    private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    // Adaptive intra-request parallelism: fan a request's segments out across
    // cores only while few requests are in flight (cuts unloaded latency);
    // under saturation each request runs serially on its own client thread —
    // fanning out there only adds subtask queueing delay to the tail while
    // total throughput is already core-bound.
    private val parThreshold =
      math.max(2, Runtime.getRuntime.availableProcessors() / 4)

    private def idfOf(t: String): Double =
      idfCache.computeIfAbsent(t, tt => {
        val df = segments.iterator.flatMap(_.terms.get(tt)).map(_.df).sum
        if (df > 0) Bm25.idf(meta.n, df) else Double.NaN // NaN marks absent
      })

    /** Ranked top-k (reference epsilon comparator) for one query. */
    def search(query: String, k: Int): Seq[(Long, Double)] =
      search(QueryParser.parse(query), k)

    def search(pq: ParsedQuery, k: Int): Seq[(Long, Double)] = {
      if (pq.terms.isEmpty) return Nil
      val load = inFlight.incrementAndGet()
      try {
        val idfs = pq.terms.distinct
          .flatMap { t => val v = idfOf(t); if (v.isNaN) None else Some(t -> v) }
          .toMap
        val shared = new Wand.SharedTheta // cross-segment pruning for this request
        val raw =
          if (parallelSegments && segments.length > 1 && load <= parThreshold)
            segments.par.flatMap(seg => Wand.searchSegment(seg, pq, idfs, meta.avgdl, k, shared)).seq
          else
            segments.flatMap(seg => Wand.searchSegment(seg, pq, idfs, meta.avgdl, k, shared))
        Bm25.sortHits(raw.map(h => (h.docId, h.score))).take(k)
      } finally inFlight.decrementAndGet()
    }

    /** Prefix term suggestions — EXTENSION (the reference's deferred Phase 9
      * "autocomplete"): top-k dictionary terms for a prefix, ranked by GLOBAL
      * df (sum of per-segment local dfs — the same Lucene-model summation as
      * scoring) desc, then term asc. Round 5: rides the sorted-vocabulary
      * range scan (the in-memory twin of the sorted v5 footer) —
      * O(log V + |matches| x segments) per request, never O(V).
      */
    def suggest(prefix: String, k: Int): Seq[(String, Long)] = {
      val norm = Tokenizer.tokenize(prefix)
      if (norm.size != 1) return Nil
      // range scan gives the matches; df = Σ per-segment local dfs via hash
      // gets — O(log V + |matches| x segments), never O(V)
      prefixRange(norm.head)
        .map(t => t -> segments.iterator.flatMap(_.terms.get(t)).map(_.df).sum)
        .sortBy { case (t, df) => (-df, t) }
        .take(k)
    }

    /** Metadata-filtered top-k — EXTENSION (the reference's deferred Phase 9
      * "filters"). The filter only RESTRICTS candidates (scores are global-idf
      * BM25, unchanged), so the exact filtered top-k is obtained by ranking
      * the FULL enumeration and verifying the predicate IN RANK ORDER with
      * early exit at k accepted — the same argument (and code) as
      * `searchPhrase`'s adjacency verification. `pred` typically reads the
      * doc sidecar (source/lang travel on the 3-field sidecar row).
      */
    def searchFiltered(
        pq: ParsedQuery,
        k: Int,
        pred: Long => Boolean,
        maxVerify: Int = 100000): Seq[(Long, Double)] = {
      val ranked = search(pq, Int.MaxValue)
      verifyInRankOrder(ranked, k, pred, maxVerify)
    }

    /** Metadata-filtered prefix search — the prefix expansion scored OR-mode
      * with the Phase-9 filter verified in rank order (see `searchFiltered`).
      */
    def searchPrefixFiltered(
        prefix: String,
        k: Int,
        pred: Long => Boolean,
        maxTerms: Int = Int.MaxValue,
        maxVerify: Int = 100000): Seq[(Long, Double)] = {
      val expanded = expandPrefix(prefix, maxTerms)
      if (expanded.isEmpty) Nil
      else searchFiltered(ParsedQuery(expanded, Nil, isOr = true), k, pred, maxVerify)
    }

    /** Wildcard + metadata filter: glob expansion composed through the same
      * bounded rank-order verification as prefix.
      */
    def searchWildcardFiltered(
        pattern: String,
        k: Int,
        pred: Long => Boolean,
        maxTerms: Int = Int.MaxValue,
        maxVerify: Int = 100000): Seq[(Long, Double)] = {
      val expanded = expandWildcard(pattern, maxTerms)
      if (expanded.isEmpty) Nil
      else searchFiltered(ParsedQuery(expanded, Nil, isOr = true), k, pred, maxVerify)
    }

    /** Prefix top-k over segments — EXTENSION (same deferred wildcard phase
      * as phrases; SURVEY §2.12). Expands the prefix against each segment's
      * in-memory term dictionary, then scores the union OR-mode in byte-lex
      * term order (matching `SearchEngine.prefixScoredDF`). Round 5: the
      * expansion is a binary search + range walk over the lazily-built
      * sorted global vocabulary (the in-memory twin of the sorted v5
      * dictionary footer) — O(log V + |matches|), never O(V) per request.
      * Default UNCAPPED so this tier scores the
      * exact term set the dataflow twin does (tier parity is the oracle
      * contract); pass `maxTerms` as an opt-in latency guard for degenerate
      * one-letter prefixes — note a cap makes results diverge from the
      * dataflow tier on large vocabularies.
      */
    def searchPrefix(prefix: String, k: Int, maxTerms: Int = Int.MaxValue): Seq[(Long, Double)] = {
      val expanded = expandPrefix(prefix, maxTerms)
      if (expanded.isEmpty) Nil
      else search(ParsedQuery(expanded, Nil, isOr = true), k)
    }

    /** General wildcard (`*bar`, `foo*bar`) — prefix generalized; expands
      * per-segment dictionaries through the compiled glob
      * ([[graft.core.Glob.matches]], identical term set to the dataflow
      * tier's pushed-down LIKE) and scores the union OR-mode in byte-lex
      * order. A literal leading chunk bounds the walk to its sorted-vocab
      * range; a leading `*` walks the (one, global, sorted) vocabulary.
      */
    def searchWildcard(pattern: String, k: Int, maxTerms: Int = Int.MaxValue): Seq[(Long, Double)] = {
      val expanded = expandWildcard(pattern, maxTerms)
      if (expanded.isEmpty) Nil
      else search(ParsedQuery(expanded, Nil, isOr = true), k)
    }

    private def expandWildcard(pattern: String, maxTerms: Int): Seq[String] =
      graft.core.Glob.normalize(pattern) match {
        case None => Nil
        case Some(g) =>
          // a literal leading chunk bounds the scan to its dictionary range
          // (`foo*bar` walks only foo*); a leading '*' with a literal TAIL
          // (`*bar`) range-scans the REVERSED dictionary (r6) — matches are
          // re-sorted byte-lex so the capped set and score order are
          // identical to the forward walk; only an unanchored pattern
          // (`*a*`) still walks the whole (one, global, sorted) vocab
          val lit = g.takeWhile(_ != '*')
          if (lit.nonEmpty)
            prefixRange(lit).iterator
              .filter(graft.core.Glob.matches(g, _)).take(maxTerms).toSeq
          else {
            val tail = g.reverse.takeWhile(_ != '*').reverse
            if (tail.nonEmpty)
              suffixRange(tail.reverse)
                .filter(graft.core.Glob.matches(g, _))
                .sorted.take(maxTerms)
            else
              sortedVocab.iterator
                .filter(graft.core.Glob.matches(g, _)).take(maxTerms).toSeq
          }
      }

    /** Typo-tolerant top-k over segments — EXTENSION (the reference's own
      * competitive-gap row, COMMERCIAL_ROADMAP.md:31). Expands the term
      * against each segment's in-memory dictionary at Levenshtein <=
      * `maxDist` (banded DP, length pre-check — `graft.core.EditDistance`,
      * DuckDB `levenshtein` semantics), then scores the union OR-mode in
      * byte-lex term order — exactly `searchPrefix`'s discipline. Round 5:
      * maxDist=1 (the default) rides the precomputed SymSpell deletion
      * neighborhood (O(|term|) probes per request); round 6: a generation
      * built with `symspellDepth = 2` extends that to maxDist=2
      * (O(|term|^2) probes); radii past the built depth fall back to the
      * dictionary scan.
      */
    def searchFuzzy(term: String, k: Int, maxDist: Int = 1, maxTerms: Int = Int.MaxValue): Seq[(Long, Double)] = {
      val expanded = expandFuzzy(term, maxDist, maxTerms)
      if (expanded.isEmpty) Nil
      else search(ParsedQuery(expanded, Nil, isOr = true), k)
    }

    /** Serving twin of `SearchEngine.didYouMeanDF` — same pick rule (exact
      * presence wins; else highest GLOBAL df within Levenshtein <= maxDist,
      * ties byte-lex; else the term itself with df 0). Global df = Σ of the
      * segments' local dfs, so the answer is bit-identical to the dataflow
      * tier's. One dictionary scan per request (the searchFuzzy note).
      */
    def didYouMean(query: String, maxDist: Int = 1): Seq[(Long, String, String, Long)] = {
      val terms = QueryParser.parse(query).terms
      if (terms.isEmpty) return Nil
      def dfOf(c: String): Long = segments.iterator.flatMap(_.terms.get(c)).map(_.df).sum
      if (maxDist <= symspellDepth) {
        // SymSpell path: per term, O(|t|^depth) probes + a verified candidate
        // set whose dfs are summed with per-segment hash gets — nothing here
        // is proportional to vocabulary size
        terms.zipWithIndex.map { case (t, i) =>
          val cands = symspell.neighbors(t, maxDist) // byte-lex sorted, verified
          val pick = pickSuggestion(t, cands.view.map(c => (c, dfOf(c))))
          (i + 1L, t, pick._1, pick._2)
        }
      } else {
        // fallback scan for radii the deletion index does not cover
        val tset = terms.distinct
        val dfs = scala.collection.mutable.HashMap[String, Long]()
        segments.foreach { seg =>
          seg.terms.foreach { case (cand, td) =>
            if (tset.exists(t =>
              math.abs(cand.length - t.length) <= maxDist &&
                graft.core.EditDistance.within(cand, t, maxDist)))
              dfs.update(cand, dfs.getOrElse(cand, 0L) + td.df)
          }
        }
        terms.zipWithIndex.map { case (t, i) =>
          val pick = SegmentSearch.pickSuggestion(t,
            dfs.view.filter { case (cand, _) => graft.core.EditDistance.within(cand, t, maxDist) })
          (i + 1L, t, pick._1, pick._2)
        }
      }
    }

    /** Metadata-filtered fuzzy search — the expansion scored OR-mode with the
      * Phase-9 filter verified in rank order (see `searchFiltered`).
      */
    def searchFuzzyFiltered(
        term: String,
        k: Int,
        pred: Long => Boolean,
        maxDist: Int = 1,
        maxTerms: Int = Int.MaxValue,
        maxVerify: Int = 100000): Seq[(Long, Double)] = {
      val expanded = expandFuzzy(term, maxDist, maxTerms)
      if (expanded.isEmpty) Nil
      else searchFiltered(ParsedQuery(expanded, Nil, isOr = true), k, pred, maxVerify)
    }

    private def expandFuzzy(term: String, maxDist: Int, maxTerms: Int): Seq[String] = {
      val norm = Tokenizer.tokenize(term)
      if (norm.size != 1) return Nil
      val t = norm.head
      val all =
        if (maxDist <= symspellDepth) symspell.neighbors(t, maxDist) // probes, not O(vocab)
        else // fallback: radii past the built deletion depth scan
          segments.iterator
            .flatMap(_.terms.keysIterator.filter(c =>
              graft.core.EditDistance.within(c, t, maxDist)))
            .toSeq.distinct.sorted
      all.take(maxTerms)
    }

    private def expandPrefix(prefix: String, maxTerms: Int): Seq[String] = {
      val norm = Tokenizer.tokenize(prefix)
      if (norm.size != 1) return Nil
      // sorted-vocab range scan (already byte-lex ascending and distinct)
      prefixRange(norm.head).take(maxTerms)
    }

    /** Learning-to-rank re-rank — EXTENSION (the roadmap's optional Phase 10
      * "LTR" row; see [[graft.search.Ltr]] for the model and the distributed
      * trainer). Serving twin of `Ltr.featuresDF` + `Ltr.rerankDF`: the
      * exact full OR enumeration (k unbounded → the WAND threshold never
      * engages, scores are the same global-idf BM25 the micro re-rank gates
      * use) supplies `f_bm25_r`; one decoded-posting walk per distinct query
      * term supplies the integer coverage features (matched count, dl, Σtf,
      * max tf — a doc lives in exactly one segment, so per-segment feature
      * maps never collide); the integer model combines them and ranks
      * (ltr_r desc, docId asc). Returns (docId, ltr_r).
      *
      * Cost: O(Σ posting lengths of the query terms) per request — the same
      * bound as the enumeration itself; no text or sidecar reads.
      */
    def searchLtr(query: String, w: Ltr.Weights, k: Int): Seq[(Long, Long)] = {
      val pq = QueryParser.parse(query)
      if (pq.terms.isEmpty) return Nil
      val orPq = pq.copy(isOr = true)
      val hits = search(orPq, Int.MaxValue)
      if (hits.isEmpty) return Nil
      val distinct = pq.terms.distinct
      val feats = new java.util.HashMap[Long, Array[Long]]() // matched, dl, tfsum, maxtf
      segments.foreach { seg =>
        distinct.foreach { t =>
          seg.postings(t).foreach { p =>
            var f = feats.get(p.docId)
            if (f == null) { f = new Array[Long](4); feats.put(p.docId, f) }
            f(0) += 1L
            f(1) = p.dl.toLong
            f(2) += p.tf.toLong
            if (p.tf.toLong > f(3)) f(3) = p.tf.toLong
          }
        }
      }
      hits
        .map { case (id, s) =>
          val f = feats.get(id)
          val ltr = w.wBm25 * math.round(s * 1e6) + w.wMatched * f(0) +
            w.wDl * f(1) + w.wTfSum * f(2) + w.wMaxTf * f(3)
          (id, ltr)
        }
        .sortBy { case (id, r) => (-r, id) }
        .take(k)
    }

    /** Phrase-adjacent top-k over segments — EXTENSION (the reference's
      * deferred phrase phase; see `graft.core.Phrase` and SURVEY §2.12).
      *
      * Stage 1 enumerates the FULL AND intersection (k unbounded, no theta —
      * posting-level work only, the same cost as a plain AND query; score
      * pruning cannot apply before the adjacency filter without losing
      * exactness). Stage 2 ranks the candidates with the reference epsilon
      * comparator FIRST, then verifies adjacency IN RANK ORDER with early
      * exit: because the phrase only FILTERS (scores are the BM25 AND
      * scores), the first k candidates that pass verification ARE the exact
      * phrase top-k — expected sidecar text reads ≈ k / selectivity instead
      * of O(all candidates). `maxVerify` hard-bounds the pathological case
      * (a frequent-term phrase that never occurs adjacently): past the cap
      * the result is best-effort-truncated instead of an accidental-DoS
      * full-corpus text scan from one cheap HTTP request.
      */
    def searchPhrase(
        phrase: String,
        k: Int,
        textOf: Long => Option[String],
        maxVerify: Int = 100000): Seq[(Long, Double)] = {
      val terms = Tokenizer.tokenize(phrase).toIndexedSeq
      if (terms.isEmpty) return Nil
      val pq = ParsedQuery(terms, Nil, isOr = false)
      val load = inFlight.incrementAndGet()
      try {
        val idfs = terms.distinct
          .flatMap { t => val v = idfOf(t); if (v.isNaN) None else Some(t -> v) }
          .toMap
        if (idfs.size < terms.distinct.size) return Nil // AND with a 0-df term
        val raw =
          if (parallelSegments && segments.length > 1 && load <= parThreshold)
            segments.par.flatMap(seg => Wand.searchSegment(seg, pq, idfs, meta.avgdl, Int.MaxValue)).seq
          else
            segments.flatMap(seg => Wand.searchSegment(seg, pq, idfs, meta.avgdl, Int.MaxValue))
        val ranked = Bm25.sortHits(raw.map(h => (h.docId, h.score)))
        verifyInRankOrder(ranked, k,
          id => textOf(id).exists(t => Phrase.containsPhrase(t, terms)), maxVerify)
      } finally inFlight.decrementAndGet()
    }

    /** Accept ranked hits passing `pred` IN RANK ORDER, early-exiting at k
      * accepted (exact when the predicate only filters — the k first
      * survivors ARE the filtered top-k) and hard-bounded by `maxVerify`
      * checked candidates (a never-matching predicate on a frequent-term
      * query must not become a full-corpus sidecar scan from one request).
      */
    private def verifyInRankOrder(
        ranked: Seq[(Long, Double)],
        k: Int,
        pred: Long => Boolean,
        maxVerify: Int): Seq[(Long, Double)] = {
      val kk = math.max(1, k)
      val out = Seq.newBuilder[(Long, Double)]
      var found = 0
      var checked = 0
      val it = ranked.iterator
      while (found < kk && checked < maxVerify && it.hasNext) {
        val hit = it.next()
        checked += 1
        if (pred(hit._1)) {
          out += hit
          found += 1
        }
      }
      out.result()
    }
  }

  private def mergeHits(hits: Array[QueryHit], nQueries: Int, k: Int): Map[Int, Seq[(Long, Double)]] = {
    val byQ = hits.groupBy(_.qid)
    (0 until nQueries).map { qid =>
      val ranked = Bm25
        .sortHits(byQ.getOrElse(qid, Array.empty[QueryHit]).map(h => (h.docId, h.score)).toIndexedSeq)
        .take(k)
      qid -> ranked
    }.toMap
  }
}
