package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch hourly rollup
  * (graft.pipeline.Events.hourlyRollup): readStream over a parquet directory,
  * event-time tumbling window + watermark, append/complete to a sink.
  *
  * The reference engine has no streaming surface (explicit non-goal,
  * /root/reference/specs/phase2_persistence.md:23-28); this exists for the
  * training-data pipeline side of the engine, where event/feedback streams
  * feed the same rollups the batch path computes. StreamingSpec asserts the
  * streaming result equals the batch result on the same input.
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Streaming hourly rollup with a 2-hour watermark. */
  def hourlyRollupStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(inputDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) * lit(1e6)).cast("long").as("sum_v_micros"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"),
        col("n"),
        col("sum_v_micros")
      )

  /** Run the stream over all currently-available input (Trigger.AvailableNow)
    * into an in-memory sink table; returns when the backlog is drained.
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, sinkTable: String): StreamingQuery = {
    val q = hourlyRollupStream(spark, inputDir).writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming SESSIONIZATION — twin of graft.pipeline.Events.sessions,
    * built on Spark's native gap-based `session_window` aggregation (the
    * Spark-first choice: Catalyst owns the session-merge state machine; no
    * custom state code). Emits one row per CLOSED session:
    * (user_id, session_start epoch-secs, ev = events in session).
    *
    * Boundary alignment with the batch rule: the batch operator computes
    * gaps with `unix_timestamp` (WHOLE SECONDS) and breaks a session when
    * the floored gap is STRICTLY GREATER than `gapMinutes` (exactly 30:00
    * stays in-session). The stream floors event time to seconds with
    * date_trunc — TimestampType is micros-precision and a sub-second
    * producer must round the same way the batch rule does. Spark merges
    * session windows that overlap OR TOUCH (an event at exactly
    * lastEvent + gap extends the session — StreamingSpec pins this with a
    * gap-exactly and gap-plus-one pair), so the native `merge iff
    * diff <= gap` IS the strictly-greater batch rule with gap =
    * gapMinutes*60 exactly — for ANY timestamp precision.
    *
    * Append mode + watermark: a session is emitted once the watermark
    * passes its close — so the LAST session of each user only flushes when
    * later input advances event time past it (StreamingSpec drives this
    * with a sentinel file; a production stream always has a next event).
    * Scale shape: state is one open session per active (user, gap-run) —
    * bounded by active users, partitioned by the groupBy exchange; the
    * RocksDB provider option applies as with dedupStream.
    */
  def sessionsStream(
      spark: SparkSession,
      inputDir: String,
      gapMinutes: Int = 30,
      watermarkDelay: String = "0 seconds"
  ): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: the watermark from batch N closes sessions in batch N+1
      .parquet(inputDir)
      .withColumn("ts_s", date_trunc("second", col("ts")))
      .withWatermark("ts_s", watermarkDelay)
      .groupBy(
        session_window(col("ts_s"), s"${gapMinutes * 60} seconds").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("ev"))
      .select(
        col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start"),
        col("ev"))

  /** Drain all available input through the sessionization stream into an
    * in-memory sink (append mode — only watermark-closed sessions emit).
    */
  def runSessionsAvailableNow(spark: SparkSession, inputDir: String, sinkTable: String): StreamingQuery = {
    val q = sessionsStream(spark, inputDir).writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("lang", StringType)
  ))

  final case class Doc(doc_id: Long, text: String, source: String, lang: String)

  /** Streaming EXACT DEDUP with custom state — flatMapGroupsWithState keyed
    * by sha256(text): the first doc carrying a given content hash passes
    * (ties within a micro-batch break on min doc_id, matching the batch
    * operator's keep-min rule); every later sighting — same batch or any
    * later one — is dropped by the per-key Boolean state. The state store is
    * checkpointed with the query, so a restarted stream keeps rejecting
    * hashes it has already passed.
    *
    * Scale shape: state is one boolean per DISTINCT content hash (not per
    * doc), partitioned by the groupByKey exchange over sha — the same key
    * distribution as the batch hash-groupBy dedup. At 100 TB that is
    * BILLIONS of keys, and the default HDFSBackedStateStoreProvider keeps
    * every key of every maintained version on the executor heap — pass
    * `stateStoreProvider = Some(RocksDbProvider)` (the 100 TB configuration)
    * to spill state to executor-local RocksDB instead. The provider is baked
    * into a checkpoint at first start; restarts must pass the same one.
    */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def dedupStream(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      checkpointDir: String,
      stateStoreProvider: Option[String] = None
  ): StreamingQuery = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    stateStoreProvider.foreach(spark.conf.set(providerKey, _))
    try {
    val q = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
      .withColumn("sha", sha2(col("text"), 256))
      .as[(Long, String, String, String, String)]
      .groupByKey(_._5)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, String, String, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._1)
            Iterator.single(Doc(first._1, first._2, first._3, first._4))
          }
      }
      .writeStream
      // parquet FILE sink: checkpoint-recoverable and exactly-once (its
      // file log commits atomically with the query checkpoint) — a restart
      // resumes the state store AND never double-writes surviving docs
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
    } finally {
      // the conf was captured by the started query; restore the session
      stateStoreProvider.foreach { _ =>
        prevProvider match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
      }
    }
  }

  /** Per-LSH-bucket streaming state: the docIds seen in this band bucket
    * (bounded by the cap — the state-size contract at scale).
    */
  final case class BucketState(ids: Array[Long])

  /** Streaming MinHash-LSH near-dup CANDIDATES — the streaming twin of
    * `Dedup.minhashSignatures -> lshBands -> lshCandidatePairs`, and it
    * literally reuses those operators' expressions (signatures and band
    * keys are row-local Catalyst exprs, so they run unchanged on a
    * streaming DataFrame); only the pairing step becomes stateful: one
    * state entry per band bucket holding the docIds seen so far, each new
    * arrival emitting a candidate pair against every prior member.
    *
    * Output rows are (doc_a, doc_b) with doc_a < doc_b, exactly-once per
    * (bucket, pair) via the parquet file sink + checkpoint; a pair sharing
    * SEVERAL bands appears once per shared band (the batch op's terminal
    * `.distinct()` is cross-bucket and has no bounded-state streaming
    * equivalent — consumers dedupe, and the downstream exact-Jaccard
    * verify is idempotent anyway).
    *
    * `maxBucket` is BOTH the skew guard and the state bound: a saturated
    * bucket stops accumulating and stops emitting — at 100 TB state per
    * bucket is O(maxBucket) ids, never O(corpus). The DEFAULT is a
    * positive bound (r6, ADVICE r5: the documented bounded-state contract
    * must hold for callers who take the defaults); pass <= 0 explicitly to
    * disable, e.g. for exact batch-parity testing. Semantics vs batch
    * differ under saturation by construction (batch drops an over-cap
    * bucket RETROACTIVELY; a stream cannot retract emitted pairs — it
    * keeps the first maxBucket members' pairs). Below the cap the
    * candidate SETS are identical (spec-asserted).
    */
  def nearDupCandidateStream(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      checkpointDir: String,
      w: Int = 5,
      maxBucket: Int = 1024
  ): StreamingQuery = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
    val bands = graft.pipeline.Dedup.lshBands(
      graft.pipeline.Dedup.minhashSignatures(docs, w))
    val q = bands
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)], state: GroupState[BucketState]) =>
          var known = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
          // sorted fresh arrivals: deterministic pair emission within a batch
          val fresh = rows.map(_._1).toArray.distinct.sorted
            .filterNot(id => known.contains(id))
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          fresh.foreach { id =>
            if (maxBucket <= 0 || known.length < maxBucket) {
              known.foreach(k =>
                out += ((math.min(k, id), math.max(k, id))))
              known = known :+ id
            } // else: saturated — neither stored nor paired (state stays bounded)
          }
          if (fresh.nonEmpty) state.update(BucketState(known))
          out.iterator
      }
      .toDF("doc_a", "doc_b")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming INDEX ingestion: readStream over a document directory ->
    * foreachBatch appending each micro-batch as new segments via
    * SegmentIndex.addDocuments. Because the segment design is append-only
    * with update-proof per-file stats (local df, statistics-free block
    * bounds, exact integer sumDl), a stream of N micro-batches yields an
    * index whose SEARCH RESULTS are bit-identical to one batch rebuild of
    * everything seen — the streaming twin of the reference's add_document
    * loop (search_service.cpp:31-57). Checkpointed: restart resumes from the
    * last committed micro-batch.
    */
  def indexIngestStream(
      spark: SparkSession,
      inputDir: String,
      indexDir: String,
      checkpointDir: String,
      bucketsPerBatch: Int = 2
  ): StreamingQuery = {
    val q = spark.readStream
      .schema(docsSchema)
      .option("maxFilesPerTrigger", 1) // one source file per micro-batch
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId closes the exactly-once hole between "addDocuments fully
        // committed (meta rewritten)" and "Spark committed the micro-batch to
        // its checkpoint": a replayed batch whose id is already recorded in
        // index_meta.json is skipped inside addDocuments instead of being
        // appended twice (the orphan cleanup only covers HALF-applied adds).
        if (!batch.isEmpty) {
          graft.index.SegmentIndex.addDocuments(
            batch, indexDir, bucketsPerBatch, batchId = Some(batchId))
        }
        ()
      }
      .start()
    q.awaitTermination()
    q
  }
}
