package graft.bench

/** Time every declared SparkEntry query with the noop sink (guide §1.4) —
  * the optimization round's per-operator survey. Two passes per query
  * (first pays JIT/build side effects, second is the reported number),
  * sorted slowest-first. Usage: QueryBench [sfDir] [filter-substring]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val filter = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.spark.Sessions
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.local.dir", "/dev/shm/graft-spark-local"), cpus, "graft-query-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    graft.SparkEntry.queries
      .filter { case (n, _) => filter.forall(n.contains) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        try {
          val cold = once()
          val warm = math.min(once(), once())
          results += ((name, cold, warm))
          println(f"$name%-28s cold ${cold}%7.3f s  warm ${warm}%7.3f s")
        } catch {
          case e: Throwable => println(f"$name%-28s FAILED ${e.getMessage.take(100)}")
        }
      }
    println("\n== slowest (warm) ==")
    results.sortBy(-_._3).take(25).foreach { case (n, c, w) =>
      println(f"$n%-28s warm ${w}%7.3f s (cold ${c}%7.3f)")
    }
    spark.stop()
  }
}
