ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "haystacksearchenginespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the ONE JSON line that graft.Bench prints; sbt's default
// logger prefixes forked stdout with "[info] " which breaks that parse
// (BENCH_r01.json had parsed:null). StdoutOutput passes it through bare.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  // G1 default: at the 24g heap ParallelGC collapses on the segment-write
  // stage (258 s GC of 330 s task time at local[32], StageDiag — old-gen
  // churn from external-sort pages); G1 builds the same index 5x faster.
  // The old ParallelGC-wins result was measured on the 8g heap.
  if (sys.env.getOrElse("SPARK_GRAFT_GC", "g1") == "parallel") "-XX:+UseParallelGC" else "-XX:+UseG1GC",
  // G1's adaptive young gen on a 24g heap grew until young pauses hit 1.2 s
  // (all 32 worker threads stalled; -Xlog:gc evidence) — cap the target so
  // pause time stays serving-grade
  "-XX:MaxGCPauseMillis=50",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: at local[32] the allocation-heavy build/serve paths need GC
  // headroom (the sandbox VM has 125 GiB; 8g measurably throttled 32-thread
  // runs — see BENCH/BASELINE.md memory note)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq.flatMap(_.split("\\s+")) // ad-hoc diagnostics, e.g. -Xlog:gc
