package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IngestSpec extends SparkTestBase {

  test("P3 OCR policy: boundary semantics (len<50 OR tokens<10)") {
    val docs = docsDF(Seq(
      1L -> ("x " * 30).trim, // 59 chars, 30 tokens -> false
      2L -> "short text", // <50 chars -> true
      3L -> ("verylongtoken " * 5 + "tail padding here now!"), // >=50 chars, 7+... count
      4L -> ("a" * 49), // 49 chars -> true
      5L -> ("a" * 50 + " b c d e f g h i j") // 50+ chars, 11 tokens -> false
    ))
    val out = Ingest.withOcrPolicy(docs).collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!out(1L))
    assert(out(2L))
    assert(out(4L))
    assert(!out(5L))
  }

  test("P1 per-row error isolation: bad rows to side output, job continues") {
    val sp = spark
    import sp.implicits._
    val src = Seq(
      ("r1", "p1", "c", "scala", "good content"),
      (null, "p2", "c", "scala", "orphan"),
      ("r3", "p3", "c", "scala", null),
      ("r4", "p4", "c", "scala", "")
    ).toDF("repo", "path", "commit", "lang", "content")
    val (good, bad) = Ingest.validated(src)
    assert(good.count() == 1)
    val reasons = bad.select("_bad_reason").collect().map(_.getString(0)).sorted
    assert(reasons.toSeq == Seq("empty_content", "null_content", "null_key"))
  }

  test("S4 JSON array source: explicit schema, {docId, text} array") {
    val f = Files.createTempFile("docs", ".json")
    Files.writeString(f,
      """[{"docId": 1, "text": "alpha bravo"}, {"docId": 2, "text": "charlie"}]""")
    val df = Ingest.loadDocsJson(spark, f.toString)
    assert(df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "alpha bravo", 2L -> "charlie"))
    // and it can feed the engine end to end
    val eng = new graft.search.SearchEngine(graft.index.IndexBuilder.build(df).cache())
    assert(eng.search("alpha") == Seq(1L))
  }
}
