package graft.search

import graft.SparkTestBase
import graft.core.{Bm25, QueryParser}
import graft.index.SegmentIndex

/** Regression spec for the r6 block-max WAND tie-drop fix: when every query
  * cursor is parked on the SAME doc and the pivot lands mid-prefix with the
  * prefix block-UB sum <= theta, the round-5 skip branch forced the window
  * past the post-pivot safety cap (`d = arr(0).curDoc + 1`) and dropped the
  * doc — even the segment's top scorer — despite its full bound (including
  * the post-pivot cursors on the same doc) exceeding theta. Reproduced by
  * replica corpora (large exact-score tie groups) in RoundTripSoak.
  *
  * The spec replays that shape deterministically: a replicated corpus where
  * every base doc exists in many copies with identical scores, multi-term
  * OR queries, k << tie-group size. Exactness contract: searchSegment(k)
  * must contain the full enumeration's top-k (rank fully, truncate last).
  */
class WandTieSpec extends SparkTestBase {

  test("k-bounded OR search returns the exact top-k under massive equal-score tie groups") {
    // The trigger needs theta to land in the narrow window
    // (blockUb(prefix), termUb(prefix)]: a Zipf-ish vocabulary with VARYING
    // document lengths (dl variance opens the blockUb/termUb gap) and
    // hundreds of near-tied scores. 400 base docs x 16 replicas, seeded.
    val rnd = new scala.util.Random(1234)
    val words = Seq("order", "sort", "query", "scan", "merge", "table", "row",
      "hash", "join", "filter", "group", "window", "batch", "stream", "value", "data")
    def baseText(i: Long): String = {
      val len = 8 + rnd.nextInt(50)
      (0 until len).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    }
    val bases = (0L until 400L).map(i => i -> baseText(i))
    val docs = for {
      rep <- 0L until 16L
      (i, t) <- bases
    } yield (rep * 1000000L + i, t + s" uq${(rep * 1000000L + i) % 997}")

    val dir = java.nio.file.Files.createTempDirectory("graft-wandtie").toString
    SegmentIndex.build(docsDF(docs), dir, buckets = 4)
    val meta = SegmentIndex.readMeta(dir)
    val segs = SegmentIndex.liveSegmentFiles(dir, meta)
      .map(SegmentIndex.loadSegment(_)).toIndexedSeq

    val qrnd = new scala.util.Random(42)
    val queries = (0 until 40).map { _ =>
      val a = words(qrnd.nextInt(words.size))
      val b = words(qrnd.nextInt(words.size))
      val c = words(qrnd.nextInt(words.size))
      s"$a OR $b $c"
    }.distinct
    queries.foreach { q =>
      val pq = QueryParser.parse(q)
      val idfs = SegmentSearch.globalIdfs(segs, meta.n, pq.terms)

      // exact reference: full enumeration, rank fully, truncate last
      val full = segs.flatMap(seg => Wand.searchSegment(seg, pq, idfs, meta.avgdl, Int.MaxValue))
      val expect = Bm25.sortHits(full.map(h => (h.docId, h.score))).take(10)

      // per-segment k=10 + the same merge the batch tiers run
      val bounded = segs.flatMap(seg => Wand.searchSegment(seg, pq, idfs, meta.avgdl, 10))
      val got = Bm25.sortHits(bounded.map(h => (h.docId, h.score))).take(10)
      assert(got == expect, s"query '$q': k-bounded top-10 != full-rank top-10")

      // and the in-memory batch entry point (shared theta, parallel segments)
      val mem = SegmentSearch.searchBatchInMemory(segs, meta, Seq(q), 10)(0)
      assert(mem == expect, s"query '$q': searchBatchInMemory != full-rank top-10")
    }
  }
}
