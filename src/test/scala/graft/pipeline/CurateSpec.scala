package graft.pipeline

import graft.SparkTestBase

/** The composed curation pipeline on a corpus with planted hazards: PII
  * that must scrub, an exact dup, a pair that becomes an exact dup ONLY
  * after scrubbing (the scrub-before-dedup ordering contract), a near-dup
  * pair, and a junk doc below the quality floor.
  */
class CurateSpec extends SparkTestBase {

  test("curate: scrub -> exact dedup -> near-dup prune -> quality floor, funnel exact") {
    val sp = spark
    import sp.implicits._
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val d = "every engine stage writes a manifest with row counts byte totals and a lineage hash for resume"
    val docs = Seq(
      (1L, a, "s1", "en"),
      (2L, a, "s1", "en"), // exact dup of 1 -> dropped (keep-min)
      (3L, "please send the invoice copy to alice@a.com before friday morning thanks team", "s2", "en"),
      (4L, "please send the invoice copy to bob@b.org before friday morning thanks team", "s2", "en"),
      // 3 and 4 differ ONLY in their email: after scrubbing both read
      // "... to <EMAIL> before ..." -> exact dups, keeper 3. Dedup BEFORE
      // scrub would have kept both.
      (5L, d, "s3", "en"),
      (6L, d.replace("resume", "restart"), "s3", "en"), // near-dup of 5 -> dropped
      (7L, "!!! ??? ***", "s4", "en"), // junk: quality ~0 -> dropped
      (8L, "distributed query engines merge partial aggregates from many workers into one final answer", "s5", "en")
    ).toDF("doc_id", "text", "source", "lang")

    val (curated, f) = Curate.curate(docs)
    val rows = curated.select("doc_id", "text", "source", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap

    assert(f == Curate.Funnel(input = 8, piiRedactions = 2, afterExactDedup = 6,
      afterNearDup = 5, afterQuality = 4), f)
    assert(rows.keySet == Set(1L, 3L, 5L, 8L), rows.keySet)
    // the curated text IS the redacted text; metadata rides along
    assert(rows(3L)._1.contains("<EMAIL>") && !rows(3L)._1.contains("alice@a.com"))
    assert(rows(3L)._2 == "s2" && rows(3L)._3 == "en")
    assert(rows(1L)._1 == a) // no PII -> untouched

    // funnel = false pays zero extra actions and returns the same corpus
    val (again, f2) = Curate.curate(docs, funnel = false)
    assert(f2.input == -1 && f2.afterQuality == -1 && f2.afterSubstringDup == -1)
    assert(again.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L, 8L))
  }

  test("curate: optional substring-dup ceiling drops verbatim-heavy near-copies LSH misses") {
    val sp = spark
    import sp.implicits._
    val run = "alpha bravo charlie delta echo foxtrot golf hotel" // 8-token verbatim run
    val docs = Seq(
      (1L, s"$run plus its own unique continuation of several more ordinary words here", "s1", "en"),
      // shares the verbatim 8-token run but a mostly-different shingle set:
      // below the LSH jaccard threshold, caught by the substring ceiling
      (2L, s"$run completely different remainder talking about other topics entirely now", "s1", "en"),
      (3L, "an unrelated document with enough ordinary words to clear every quality floor easily", "s2", "en")
    ).toDF("doc_id", "text", "source", "lang")

    // without the ceiling all three survive (not exact dups, not LSH near-dups at j>=0.9)
    val (base, _) = Curate.curate(docs, jMicrosThreshold = 900000L)
    assert(base.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    // with the ceiling: docs 1+2 share exactly the one 8-token window
    // inside the verbatim run. doc 1: 19 tokens -> 12 windows, share
    // 1/12 = 83,333 micros; doc 2: 18 tokens -> 11 windows, share 90,909.
    // A 50,000 cap drops both; doc 3 (no shared windows) survives.
    val (capped, f) = Curate.curate(docs, jMicrosThreshold = 900000L,
      maxSubstringDupMicros = 50000L, substringW = 8)
    assert(capped.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L), f)
    assert(f.afterSubstringDup == 1L, f)

    // a looser cap (above both shares) keeps everything
    val (loose, _) = Curate.curate(docs, jMicrosThreshold = 900000L,
      maxSubstringDupMicros = 100000L, substringW = 8)
    assert(loose.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("CurateJob: argument matrix + end-to-end curated index answers queries") {
    assert(CurateJobRunner.run(Array("--help")) == 0)
    assert(CurateJobRunner.run(Array.empty) == 2)
    assert(CurateJobRunner.run(Array("--bogus", "a", "b")) == 2)
    assert(CurateJobRunner.run(Array("a", "b", "0")) == 2)
    assert(CurateJobRunner.run(Array("a", "b", "8", "extra")) == 2)
    assert(CurateJobRunner.run(Array("/not/here.parquet", "/tmp/x")) == 3)
    assert(CurateJobRunner.run(Array("--substring-cap=abc", "a", "b")) == 2)
    // -1 is the internal "disabled" sentinel — typing it must be an error,
    // not a silent stage skip
    assert(CurateJobRunner.run(Array("--substring-cap=-1", "a", "b")) == 2)
    assert(CurateJobRunner.run(Array("--substring-cap=50000", "/not/here.parquet", "/tmp/x")) == 3)

    val sp = spark
    import sp.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-curate-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-curate-idx").toString + "/idx"
    Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet", "s", "en"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet", "s", "en"),
      (3L, "completely different words about engines and indexes and the merges they run", "s", "en")
    ).toDF("doc_id", "text", "source", "lang").write.mode("overwrite").parquet(src)
    assert(CurateJobRunner.run(Array(src, out, "2")) == 0)
    // curated artifact exists; the built index answers and excludes the dup
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "curated")))
    val hits = graft.search.SegmentSearch.searchBatch(spark, out, Seq("alpha charlie"), 10)(0)
    assert(hits.map(_._1) == Seq(1L), hits)
  }
}

/** Alias so the spec reads naturally (CurateJob lives in graft.app). */
private object CurateJobRunner {
  def run(args: Array[String]): Int = graft.app.CurateJob.run(args)
}
