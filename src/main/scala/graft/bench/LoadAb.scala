package graft.bench

import java.nio.file.{Files, Paths}

import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Interleaved A/B of v5 segment loading: eager (whole file materialized)
  * vs lazy (dictionary only + on-demand term records), plus first-query
  * cost on the lazy form. Appends a section to BENCH/BASELINE.md.
  */
object LoadAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICAS", "32").toInt
    val spark = graft.spark.Sessions.local(32, 32, "graft-load-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val out = Files.createTempDirectory(Paths.get("/dev/shm"), "graft-load-ab").toString
    val docs = Workload.replicatedDocs(spark, sfDir, replicas)
    SegmentIndex.build(docs, out, buckets = 32)
    val meta = SegmentIndex.readMeta(out)
    val files = SegmentIndex.segmentFiles(out)
    val queries = Workload.queries(spark, sfDir, 20, "selective")
    spark.stop()

    def eagerLoad() = files.map(SegmentIndex.loadSegment(_, eager = true))
    def lazyLoad() = files.map(SegmentIndex.loadSegment(_, eager = false))
    eagerLoad(); lazyLoad() // warm page cache + JIT

    val (eagerSec, lazySec, lazyQuerySec) = (1 to 3).map { _ =>
      val (_, e) = Workload.timed(eagerLoad())
      val (segs, l) = Workload.timed(lazyLoad())
      val (_, q) = Workload.timed(SegmentSearch.searchBatchInMemory(segs, meta, queries, 10))
      (e, l, q)
    }.minBy(_._1)

    val totalBytes = files.map(f => Files.size(Paths.get(f))).sum
    val md =
      f"""## Segment load: eager vs lazy (format v5 term-dictionary footer)
         |
         |${meta.n}%,d docs, ${files.size} segments, ${totalBytes / 1024 / 1024} MiB total; best-of-3 interleaved.
         |
         || mode | load all segments | notes |
         ||---|---|---|
         || eager (pin everything) | $eagerSec%.3f s | whole files decoded — the serving model |
         || lazy (dictionary only) | $lazySec%.3f s | O(vocabulary) per segment; + $lazyQuerySec%.3f s for 20 selective queries loading ONLY their terms |
         |
         |At 100 TB a segment can exceed executor heap; executor batch tasks use
         |the lazy path, so load cost scales with vocabulary and query cost with
         |the query's own terms, never with segment file size.
         |""".stripMargin
    BenchReport.replaceSection("## Segment load: eager vs lazy", md)
    println(md)
  }
}
