package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` for the declared queries (and the build's
  * docstore-write job) to files — the plans/r06 evidence the optimization
  * round commits. Usage: PlanDump <outDir> <suffix> [query ...]
  * (default query set = the ones round 6 touched).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = args.lift(1).getOrElse("after")
    val names =
      if (args.length > 2 && args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 2) args.drop(2).toSeq
      else Seq("q_fuzzy_topk", "q_didyoumean", "q_substring_dups", "q_bm25_topk")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.spark.Sessions.local(8, 8, "graft-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), s)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }

    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) => dump(n, fn(spark, sfDir))
        case None => System.err.println(s"unknown query: $n")
      }
    }

    // the segment build's job-1 dataflow (docstore write projection) — built
    // inline so the plan is dumpable without running the write; uses the
    // tfbin expression when this engine version has it, else the map form
    graft.expr.RefTokenizeTf.register(spark)
    val hasTfbin = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("ref_tokenize_tfbin"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("bucket", spark_partition_id())
    val store =
      if (hasTfbin)
        docs.withColumn("tt", call_function("ref_tokenize_tfbin", col("text")))
          .withColumn("dl", col("tt.dl")).withColumn("tfbin", col("tt.tfbin")).drop("tt")
      else
        docs.withColumn("tt", call_function("ref_tokenize_tf", col("text")))
          .withColumn("dl", col("tt.dl")).withColumn("tfmap", col("tt.tfmap")).drop("tt")
    dump("build_docstore_job", store.withColumn("sha", sha2(col("text"), 256)))

    // fuzzy expansion scan: the round-5 Scala-UDF predicate vs the round-6
    // built-in thresholded levenshtein, over the same dictionary relation —
    // the plan pair evidencing VERDICT r5 "what's wrong" #2
    val dfTable = graft.index.IndexBuilder
      .build(spark.read.parquet(s"$sfDir/documents.parquet")).dfTable
    val t = "tabl"
    val udfWithin = udf((cand: String) => graft.core.EditDistance.within(cand, t, 1))
    dump("fuzzy_expansion_udf",
      dfTable.filter(length(col("term")).between(t.length - 1, t.length + 1))
        .filter(udfWithin(col("term"))).select(col("term")))
    dump("fuzzy_expansion_builtin",
      dfTable.filter(length(col("term")).between(t.length - 1, t.length + 1))
        .filter(levenshtein(col("term"), lit(t), 1) >= 0).select(col("term")))

    spark.stop()
  }
}
