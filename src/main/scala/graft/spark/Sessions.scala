package graft.spark

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration. */
object Sessions {
  def local(cores: Int = 32, shufflePartitions: Int = 32, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), shufflePartitions, appName)
      .getOrCreate()

  def configure(
      b: SparkSession.Builder,
      shufflePartitions: Int,
      appName: String
  ): SparkSession.Builder =
    b.appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE: runtime coalescing + skew-join splitting — the backstop for
      // skewed high-DF terms on top of our explicit salting.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
}
