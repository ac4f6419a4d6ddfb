package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.pipeline.Events

class StreamingSpec extends SparkTestBase {

  test("streaming hourly rollup == batch hourly rollup on the same input") {
    val sp = spark
    import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val rnd = new scala.util.Random(5)
    val rows = (1L to 500L).map { i =>
      (i, ts(rnd.nextInt(600).toLong), i % 13, Seq("click", "view", "buy")(rnd.nextInt(3)),
        rnd.nextInt(1000) / 10.0, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val dir = Files.createTempDirectory("graft-stream").toString
    df.coalesce(2).write.mode("overwrite").parquet(dir)

    EventStream.runAvailableNow(spark, dir, "rollup_sink")
    val streaming = spark.table("rollup_sink").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    val batch = Events.hourlyRollup(spark.read.parquet(dir)).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(streaming == batch)
    assert(batch.nonEmpty)
  }

  test("streaming LSH near-dup candidates == batch candidate set; cross-batch pairs found; cap bounds state") {
    val sp = spark
    import sp.implicits._
    // planted near-dups: pairs (i, i+1000) share most shingles; fillers are
    // unique. Split across THREE files so maxFilesPerTrigger=1 forces each
    // planted pair's members into DIFFERENT micro-batches.
    def nearText(i: Long, variant: Int) = {
      val base = (0 until 12).map(j => s"tok${(i * 7 + j) % 50}").mkString(" ")
      if (variant == 0) base else base + " extraword"
    }
    val a = (1L to 20L).map(i => (i, nearText(i, 0), "s", "en"))
    val b = (1L to 20L).map(i => (i + 1000L, nearText(i, 1), "s", "en"))
    val fill = (2001L to 2030L).map(i => (i, s"unique$i " + (0 until 10).map(j => s"u${i}x$j").mkString(" "), "s", "en"))
    val dir = Files.createTempDirectory("graft-stream-neardup").toString
    a.toDF("doc_id", "text", "source", "lang").coalesce(1).write.mode("append").parquet(dir)
    b.toDF("doc_id", "text", "source", "lang").coalesce(1).write.mode("append").parquet(dir)
    fill.toDF("doc_id", "text", "source", "lang").coalesce(1).write.mode("append").parquet(dir)

    val outDir = Files.createTempDirectory("graft-neardup-out").toString
    val ckDir = Files.createTempDirectory("graft-neardup-ck").toString
    // maxBucket = 0 EXPLICITLY: exact uncapped batch parity is the thing
    // under test (the production default is a positive state bound — r6)
    EventStream.nearDupCandidateStream(spark, dir, outDir, ckDir, w = 5, maxBucket = 0)
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batchDocs = spark.read.parquet(dir)
    val batch = graft.pipeline.Dedup.lshCandidatePairs(
      graft.pipeline.Dedup.lshBands(graft.pipeline.Dedup.minhashSignatures(batchDocs, 5)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    // cross-batch recall: each planted pair's members arrived in DIFFERENT
    // micro-batches (files), so every one found proves bucket state spans
    // batches. LSH is probabilistic by design — require most, not all.
    val planted = (1L to 20L).count(i => streamed.contains((i, i + 1000L)))
    assert(planted >= 15, s"only $planted/20 planted cross-batch pairs found")

    // cap: a degenerate bucket (identical docs -> identical bands) stops at
    // maxBucket members -> at most C(cap,2) pairs per band from it
    val dup = (1L to 10L).map(i => (i, "same same same tokens here all identical words", "s", "en"))
    val dir2 = Files.createTempDirectory("graft-stream-neardup2").toString
    dup.toDF("doc_id", "text", "source", "lang").coalesce(1).write.mode("overwrite").parquet(dir2)
    val out2 = Files.createTempDirectory("graft-neardup-out2").toString
    EventStream.nearDupCandidateStream(spark, dir2, out2,
      Files.createTempDirectory("graft-neardup-ck2").toString, w = 5, maxBucket = 3)
    val capped = spark.read.parquet(out2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 3 members per bucket -> 3 distinct pairs (identical docs share ALL
    // bands, so the same 3 pairs repeat per band and collapse in the set)
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L)), capped.toString)
  }

  test("streaming sessionization (native session_window) == batch gap rule, incl. the exact-30:00 boundary") {
    val sp = spark
    import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // hand-built boundary cases + random bulk:
    //   user 1: gaps 10, EXACTLY 30 (merge: batch rule is strictly-greater),
    //           31 (split) -> 2 sessions, max 3 events
    //   user 2: single event -> 1 session of 1
    def tsMs(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val hand = Seq(
      (1L, ts(0), 1L), (2L, ts(10), 1L), (3L, ts(40), 1L), (4L, ts(71), 1L),
      (5L, ts(5), 2L),
      // sub-second timestamps: the batch rule floors to seconds
      // (unix_timestamp), so 0.0s -> 1800.5s is a 1800-second gap (merge)
      (6L, tsMs(0), 10L), (7L, tsMs(1800500), 10L),
      // and 0.9s -> 1801.0s floors to 1801 (split)
      (8L, tsMs(900), 11L), (9L, tsMs(1801000), 11L)
    )
    val rnd = new scala.util.Random(17)
    val bulk = (100L to 400L).map(i => (i, ts(rnd.nextInt(600).toLong), 3L + i % 7))
    val rows = (hand ++ bulk).map { case (id, t, u) => (id, t, u, "click", 1.0, "{}") }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val dir = Files.createTempDirectory("graft-stream-sess").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    // sentinel SECOND FILE far past every real event: its micro-batch
    // advances the watermark so every real session closes and emits
    // (append-mode sessions flush only when event time passes them)
    Seq((9999L, ts(100000), 999999L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

    EventStream.runSessionsAvailableNow(spark, dir, "sessions_sink")
    // per-session rows -> the batch operator's per-user rollup shape
    val streaming = spark.table("sessions_sink")
      .filter($"user_id" =!= 999999L)
      .groupBy($"user_id")
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_sessions"),
        org.apache.spark.sql.functions.max($"ev").as("max_session_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val batch = Events.sessions(df.toDF()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(streaming == batch, s"streaming=$streaming batch=$batch")
    assert(batch(1L) == ((2L, 3L)), "exact-30:00 gap must merge; 31-min gap must split")
    assert(batch(2L) == ((1L, 1L)))
    assert(batch(10L) == ((1L, 2L)), "floor-second gap 1800 must merge (sub-second input)")
    assert(batch(11L) == ((2L, 1L)), "floor-second gap 1801 must split (sub-second input)")
  }

  /** The dedup scenario, parameterized by state-store provider: three
    * micro-batches with in-batch and cross-batch dups, then a restart from
    * the checkpoint that must keep rejecting previously-seen content.
    */
  private def dedupScenario(provider: Option[String]): Unit = {
    val sp = spark
    import sp.implicits._
    // three micro-batches; content "dup-X" recurs within AND across batches
    val batches = Seq(
      Seq((1L, "dup-a"), (2L, "unique-1"), (5L, "dup-a")), // in-batch dup: min id 1 wins
      Seq((3L, "dup-a"), (4L, "dup-b"), (6L, "unique-2")), // cross-batch dup: 3 dropped
      Seq((7L, "dup-b"), (8L, "unique-3"))                 // cross-batch dup: 7 dropped
    )
    val flat = Files.createTempDirectory("graft-dedup-flat").toString
    batches.zipWithIndex.foreach { case (g, i) =>
      val tmp = Files.createTempDirectory(s"graft-dedup-part$i").toString
      g.map { case (id, t) => (id, t, s"src${id % 2}", "en") }
        .toDF("doc_id", "text", "source", "lang")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      Files.list(java.nio.file.Paths.get(tmp)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.copy(p, java.nio.file.Paths.get(flat, s"batch$i.parquet")))
    }
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val outDir = Files.createTempDirectory("graft-dedup-out").toString
    EventStream.dedupStream(spark, flat, outDir, ckpt, provider)
    val kept = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 6L, 8L)) // first sighting per content, min-id in-batch

    // restart with a NEW file repeating old content + one new doc: the
    // checkpointed state still rejects the old hashes
    val more = Seq((9L, "dup-a", "src1", "en"), (10L, "unique-4", "src0", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val tmp2 = Files.createTempDirectory("graft-dedup-more").toString
    more.coalesce(1).write.mode("overwrite").parquet(tmp2)
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(tmp2)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.copy(p, java.nio.file.Paths.get(flat, "batch3.parquet")))
    EventStream.dedupStream(spark, flat, outDir, ckpt, provider)
    val kept2 = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSet
    assert(kept2 == kept + 10L, s"restarted stream must add only the new content, got $kept2")
  }

  test("stateful streaming exact dedup (flatMapGroupsWithState) == batch keep-min; state survives restart") {
    dedupScenario(None)
  }

  test("stateful streaming exact dedup on the RocksDB state store (the 100 TB state backend)") {
    dedupScenario(Some(EventStream.RocksDbProvider))
    // the provider conf must not leak into the session after the query
    // (getOption surfaces Spark's built-in default, so assert on the value)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .contains(EventStream.RocksDbProvider))
  }

  test("streaming index ingestion (foreachBatch addDocuments) == one batch rebuild") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(9)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "rare7")
    val docs = (1L to 60L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        s"repo${id % 3}", "en")
    }
    val inDir = Files.createTempDirectory("graft-stream-docs").toString
    // three source files -> three micro-batches (maxFilesPerTrigger=1)
    docs.grouped(20).zipWithIndex.foreach { case (g, i) =>
      g.toDF("doc_id", "text", "source", "lang")
        .coalesce(1).write.mode("overwrite").parquet(s"$inDir/part$i")
    }
    // the streaming file source wants one flat dir of files: copy each
    // group's single part-file in as batch<i>.parquet
    val flat = Files.createTempDirectory("graft-stream-flat").toString
    (0 until 3).foreach { i =>
      val src = java.nio.file.Paths.get(s"$inDir/part$i")
      import scala.jdk.CollectionConverters._
      Files.list(src).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.copy(p, java.nio.file.Paths.get(flat, s"batch$i.parquet")))
    }

    val idxDir = Files.createTempDirectory("graft-stream-idx").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    EventStream.indexIngestStream(spark, flat, idxDir, ckpt, bucketsPerBatch = 2)

    val full = Files.createTempDirectory("graft-full-idx").toString
    graft.index.SegmentIndex.build(
      docs.toDF("doc_id", "text", "source", "lang"), full, buckets = 2)

    val mA = graft.index.SegmentIndex.readMeta(idxDir)
    val mB = graft.index.SegmentIndex.readMeta(full)
    assert(mA.n == mB.n && mA.sumDl == mB.sumDl && mA.avgdl == mB.avgdl)
    val segsA = graft.index.SegmentIndex.segmentFiles(idxDir).map(graft.index.SegmentIndex.loadSegment(_))
    val segsB = graft.index.SegmentIndex.segmentFiles(full).map(graft.index.SegmentIndex.loadSegment(_))
    for (q <- Seq("alpha", "alpha bravo", "charlie OR rare7", "delta -echo", "rare7 rare7")) {
      val a = graft.search.SegmentSearch.searchBatchInMemory(segsA, mA, Seq(q), 100)(0)
      val b = graft.search.SegmentSearch.searchBatchInMemory(segsB, mB, Seq(q), 100)(0)
      assert(a == b, s"q='$q' streamed=$a full=$b")
    }
  }
}

class SourceTableSpec extends SparkTestBase {
  import graft.sources.SourceTable

  test("synthetic source: deterministic, schema-exact, sha invariant verifiable") {
    val a = SourceTable.synthetic(spark, 500)
    val b = SourceTable.synthetic(spark, 500)
    assert(a.schema.fieldNames.toSeq == Seq("repo", "path", "commit", "lang", "content"))
    val ha = a.selectExpr("sha2(concat_ws('|', repo, path, commit, lang, content), 256) h")
      .agg(org.apache.spark.sql.functions.expr("bit_xor(cast(conv(substr(h,1,15),16,10) as bigint))")).collect()(0)
    val hb = b.selectExpr("sha2(concat_ws('|', repo, path, commit, lang, content), 256) h")
      .agg(org.apache.spark.sql.functions.expr("bit_xor(cast(conv(substr(h,1,15),16,10) as bigint))")).collect()(0)
    assert(ha == hb) // generation is seed-stable
    assert(a.count() == 500)

    val withSha = SourceTable.withSha(a)
    assert(SourceTable.verifyInvariant(withSha) == 0L)
    // corrupt one row -> invariant catches it
    val corrupted = withSha.withColumn("content",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("path").endsWith("000000000003.scala"),
        org.apache.spark.sql.functions.lit("tampered")
      ).otherwise(org.apache.spark.sql.functions.col("content")))
    assert(SourceTable.verifyInvariant(corrupted) >= 1L)
  }

  test("code-aware tokens index camelCase identifiers from synthetic code") {
    val src = SourceTable.synthetic(spark, 50)
    val tokens = src.select(graft.index.IndexBuilder.codeTokenizeUdf(
      org.apache.spark.sql.functions.col("content")).as("t"))
      .selectExpr("explode(t) term").distinct().collect().map(_.getString(0)).toSet
    // "handleHTTPResponse" must yield the folded original AND the sub-tokens
    if (tokens.contains("handlehttpresponse"))
      assert(tokens.contains("handle") && tokens.contains("http") && tokens.contains("response"))
  }
}
