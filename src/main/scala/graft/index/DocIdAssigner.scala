package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense docId assignment (reference P2,
  * /root/reference/src/ingestion/deterministic_aggregator.cpp:10-32: sort by
  * (source_path, page_number), assign 1..N; completion order must not
  * matter).
  *
  * Spark-scale version (SURVEY §2.2): global order established by
  * `repartitionByRange` + `sortWithinPartitions` on the sort keys, then dense
  * ids via the classic two-pass prefix-sum:
  *
  *   pass 1 — per-range-partition row counts (one long per partition),
  *            prefix-summed into offsets on the driver;
  *   pass 2 — id = offset(partition) + row_number within the partition.
  *
  * The partition id is FROZEN as a data column (`spark_partition_id()` right
  * after the range exchange, persisted and materialized) rather than read via
  * TaskContext at execution time — downstream narrow transformations like
  * `coalesce(1)` fuse parent partitions into one task, which would silently
  * corrupt TaskContext-based ids. Offsets come back via a broadcast join, so
  * the plan stays fully declarative (no RDD, input_hint) and scales to any
  * partition count. No `monotonically_increasing_id` (not dense, not stable).
  */
object DocIdAssigner {

  def assign(df: DataFrame, sortCols: Seq[String], idCol: String = "assigned_id"): DataFrame = {
    val spark = df.sparkSession
    val keys = sortCols.map(col)

    val parts = df
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    parts.count() // freeze __pid before any dependent job runs

    // pass 1: per-partition counts -> prefix-sum offsets (driver side, tiny)
    val counts = parts
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val row = (pid, acc); acc += c; row
    }

    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("__pid", "__offset")

    // pass 2: id = offset + row_number within the range partition
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    parts
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn(idCol, (col("__offset") + row_number().over(w).cast("long")).cast("long"))
      .drop("__pid", "__offset")
  }
}
