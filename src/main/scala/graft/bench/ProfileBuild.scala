package graft.bench

import org.apache.spark.sql.functions._

/** Optimization-round decomposition of the build's two dominant stages
  * (guide §1.4 noop-sink isolation): times each ingredient of the
  * docstore-write projection separately, so the 150+ s of stage task-time
  * attributes to tokenize vs sha vs sort vs parquet-encode. Warm-measured
  * (JIT paid by a first pass), best-of-2.
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.spark.Sessions
      .configure(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.local.dir", "/dev/shm/graft-spark-local"), cpus, "graft-profile-build")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.RefTokenizeTf.register(spark)

    val docs = Workload.replicatedDocs(spark, sfDir, 32)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def t(label: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      body // JIT/warm
      Workload.awaitQuietHost(label, capMs = 60000)
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"== $label%-46s ${best}%7.3f s")
    }

    t("A read+replicate only (noop)")(noop(docs))
    t("B + sha2 (noop)")(noop(docs.withColumn("sha", sha2(col("text"), 256))))
    t("C + tokenize_tf (noop)")(noop(docs.withColumn("tt", call_function("ref_tokenize_tf", col("text")))))
    t("D + tokenize+sha (noop)")(noop(
      docs.withColumn("tt", call_function("ref_tokenize_tf", col("text")))
        .withColumn("sha", sha2(col("text"), 256))))
    t("E + range exchange (noop)")(noop(
      docs.repartitionByRange(cpus, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .withColumn("bucket", spark_partition_id())
        .withColumn("tt", call_function("ref_tokenize_tf", col("text")))
        .withColumn("dl", col("tt.dl")).withColumn("tfmap", col("tt.tfmap")).drop("tt")
        .withColumn("sha", sha2(col("text"), 256))))
    def fullStore = docs.repartitionByRange(cpus, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("bucket", spark_partition_id())
      .withColumn("tt", call_function("ref_tokenize_tf", col("text")))
      .withColumn("dl", col("tt.dl")).withColumn("tfmap", col("tt.tfmap")).drop("tt")
      .withColumn("sha", sha2(col("text"), 256))
    for (codec <- Seq("snappy", "lz4", "zstd", "uncompressed")) {
      t(s"F docstore parquet write [$codec]")(
        fullStore.write.mode("overwrite")
          .option("compression", codec).parquet("/dev/shm/graft-profile-store"))
      println(s"   bytes: " + scala.sys.process.Process(
        Seq("du", "-sh", "/dev/shm/graft-profile-store")).!!.trim)
    }
    t("F2 write WITHOUT dictionary encoding")(
      fullStore.write.mode("overwrite")
        .option("compression", "snappy").option("parquet.enable.dictionary", "false")
        .parquet("/dev/shm/graft-profile-store"))
    t("F3 write WITHOUT tfmap column")(
      fullStore.drop("tfmap").write.mode("overwrite")
        .option("compression", "snappy").parquet("/dev/shm/graft-profile-store-notf"))
    t("F4 write WITHOUT text column")(
      fullStore.drop("text").write.mode("overwrite")
        .option("compression", "snappy").parquet("/dev/shm/graft-profile-store-notext"))
    scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf",
      "/dev/shm/graft-profile-store-notf", "/dev/shm/graft-profile-store-notext")).!)
    t("F5 full write again [snappy]")(
      fullStore.write.mode("overwrite")
        .option("compression", "snappy").parquet("/dev/shm/graft-profile-store"))
    // the segment job's read side alone (column-pruned, one file per task)
    t("G docstore readback scan (noop)")(noop(
      spark.read.parquet("/dev/shm/graft-profile-store")
        .select(col("bucket"), col("doc_id"), col("dl"), col("tfmap"), col("sha"))))

    spark.stop()
    scala.util.Try(scala.sys.process.Process(Seq("rm", "-rf", "/dev/shm/graft-profile-store")).!)
  }
}
