package graft.bench

import java.nio.file.{Files, Paths}

/** BENCH/BASELINE.md section manager: each bench owns one "## ..." section
  * and replaces it idempotently, so re-runs never clobber other benches'
  * results.
  */
object BenchReport {
  private val path = Paths.get("BENCH/BASELINE.md")
  private val header =
    """# BENCH/BASELINE — measured engine numbers
      |
      |North-rule gates (/root/repo/BASELINE.json): BM25 top-k QPS +
      |index-build throughput, rank-identical results, scaling efficiency
      |>= 0.8 from N to 4N parallelism (no real cluster in this sandbox:
      |same job at two parallelism levels + host-ceiling calibration).
      |""".stripMargin

  def replaceSection(title: String, body: String): Unit = synchronized {
    Files.createDirectories(Paths.get("BENCH"))
    val prev = if (Files.exists(path)) Files.readString(path) else header
    val lines = prev.split("\n", -1).toVector
    val start = lines.indexWhere(_.startsWith(title))
    val cleaned =
      if (start < 0) lines
      else {
        val end = lines.indexWhere(l => l.startsWith("## ") && !l.startsWith(title), start + 1)
        if (end < 0) lines.take(start) else lines.take(start) ++ lines.drop(end)
      }
    val out = (cleaned.mkString("\n").stripLineEnd + "\n\n" + body.stripLineEnd + "\n")
    Files.writeString(path, out)
  }
}
