package graft.index

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DocIdAssignerSpec extends SparkTestBase {

  test("dense deterministic ids in (repo, path) order") {
    val sp = spark
    import sp.implicits._
    val rows = for {
      r <- Seq("src0", "src1", "src10", "src2")
      i <- 1 to 25
    } yield (r, f"doc_$i%04d")
    // shuffle input order to prove completion-order independence
    val df = new scala.util.Random(7).shuffle(rows).toDF("repo", "path").repartition(5)
    val out = DocIdAssigner.assign(df, Seq("repo", "path"), "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3)
    assert(out.map(_._3).toSeq == (1L to 100L)) // dense 1..N
    assert(out.map(t => (t._1, t._2)).toSeq == rows.sorted) // lexicographic
  }

  test("ids survive narrow coalesce(1) downstream (TaskContext fusion regression)") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 200).map(i => (s"r${i % 7}", f"p$i%04d")).toDF("repo", "path").repartition(6)
    val assigned = DocIdAssigner.assign(df, Seq("repo", "path"), "id")
    // coalesce(1) fuses parent partitions into one task — ids must not change
    val viaCoalesce = assigned.coalesce(1).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val direct = assigned.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(viaCoalesce == direct)
    assert(viaCoalesce.values.toSeq.sorted == (1L to 200L))
  }
}
