package graft.bench

/** Smoke-probe for `local-cluster` master support in this environment:
  * separate executor JVMs with separate heaps — one step closer to real
  * N-executor semantics than threads in one JVM (the north rule speaks of
  * executors). Prints PROBE OK + executor count when the mode works;
  * ScalingBench's SPARK_GRAFT_SCALING_MASTER=local-cluster mode depends on
  * exactly this launch path (SPARK_HOME must point at a full distribution).
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val workers = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val coresPer = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
    val memMb = args.lift(2).flatMap(_.toIntOption).getOrElse(2048)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPer,$memMb]")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", (workers * coresPer).toString)
      .appName("graft-cluster-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val sum = spark.range(0, 1000000, 1, workers * coresPer)
        .selectExpr("sum(id)").head().getLong(0)
      // exercise APP classes on the executors (extraClassPath must carry them)
      import spark.implicits._
      val toks = spark.createDataset(Seq("hello graft cluster", "alpha beta"))
        .flatMap(graft.core.Tokenizer.tokenize(_)).count()
      val execs = spark.sparkContext.statusTracker.getExecutorInfos.length
      println(s"PROBE OK sum=$sum tokens=$toks executorsInclDriver=$execs")
    } finally spark.stop()
  }
}
