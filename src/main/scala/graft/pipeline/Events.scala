package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (batch form; the Structured Streaming twin of the
  * hourly rollup lives in graft.streaming.EventStream and is asserted
  * equivalent in StreamingSpec).
  */
object Events {

  /** Hourly tumbling-window rollup per event_type, via the streaming-style
    * `window()` function. Output: (hour_start epoch-secs, event_type, n,
    * sum_v_micros).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) * lit(1e6)).cast("long").as("sum_v_micros"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"),
        col("n"),
        col("sum_v_micros")
      )

  /** Sessionization: a session breaks after a gap > `gapMinutes` between a
    * user's consecutive events. Output: (user_id, n_sessions,
    * max_session_events).
    */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapMinutes * 60L,
          1L
        ).otherwise(0L)
      )
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), max(col("ev")).as("max_session_events"))
  }
}
