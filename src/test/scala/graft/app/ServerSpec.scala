package graft.app

import java.net.{HttpURLConnection, URL}
import java.nio.file.Files

import graft.SparkTestBase
import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Runtime spec for the HTTP serving endpoint (the reference's runtime tests,
  * /root/reference/tests/test_runtime_*.cpp, in spirit): start, gate on
  * /health, assert ranked parity with the in-memory engine, k semantics.
  */
class ServerSpec extends SparkTestBase {

  private def get(url: String): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(2000)
    conn.setReadTimeout(10000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("server: /health gates readiness; /search matches the engine; k clamped") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha bravo charlie", "repoA", "en"),
      (2L, "alpha alpha delta", "repoB", "de"),
      (3L, "bravo charlie delta echo", "repoA", "en"),
      (4L, "charlie delta echo foxtrot", "repoC", "fr"),
      (5L, "alpha echo", "repoB", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val dir = Files.createTempDirectory("graft-server").toString
    SegmentIndex.build(docs, dir, buckets = 2)

    val meta = SegmentIndex.readMeta(dir)
    val segs = SegmentIndex.segmentFiles(dir).map(SegmentIndex.loadSegment(_)).toIndexedSeq
    val engine = new SegmentSearch.ServingEngine(segs, meta)
    val docMap = spark.read.parquet(s"$dir/docstore")
      .select("doc_id", "text", "source", "lang")
      .collect()
      .map(r => r.getLong(0) -> SearchServer.DocRow(r.getString(1), r.getString(2), r.getString(3)))
      .toMap

    val server = SearchServer.start(engine, docMap.get, port = 0)
    val base = s"http://127.0.0.1:${server.port}"
    try {
      // health gate (poll like a real client would)
      var healthy = false
      var tries = 0
      while (!healthy && tries < 50) {
        try { healthy = get(s"$base/health") == ((200, "OK")) }
        catch { case _: Exception => Thread.sleep(50) }
        tries += 1
      }
      assert(healthy, "/health never returned 200 OK")

      // ranked JSON parity with the in-memory engine
      val (code, body) = get(s"$base/search?q=alpha+delta&k=3")
      assert(code == 200)
      val expected = engine.search("alpha delta", 3)
      val gotIds = """"docId":(\d+)""".r.findAllMatchIn(body).map(_.group(1).toLong).toSeq
      assert(gotIds == expected.map(_._1), s"body=$body expected=$expected")
      val gotScores = """"score":([-0-9.E]+)""".r.findAllMatchIn(body).map(_.group(1).toDouble).toSeq
      expected.map(_._2).zip(gotScores).foreach { case (e, g) => assert(math.abs(e - g) < 1e-12) }
      // metadata decorates every hit
      assert(""""source":"repo[ABC]"""".r.findAllIn(body).size == gotIds.size)
      assert(""""lang":"(en|de|fr)"""".r.findAllIn(body).size == gotIds.size)
      assert(body.contains(""""snippet":""""))

      // k = max(1, k): k=0 still returns one hit
      val (_, k0) = get(s"$base/search?q=alpha&k=0")
      assert(""""docId":""".r.findAllIn(k0).size == 1)
      // default k = 10 (more hits than matches -> all matches)
      val (_, dflt) = get(s"$base/search?q=alpha")
      assert(""""docId":""".r.findAllIn(dflt).size == engine.search("alpha", 10).size)
      // invalid k ignored -> default
      val (cInv, _) = get(s"$base/search?q=alpha&k=zz")
      assert(cInv == 200)
      // empty / no-match queries return empty results
      assert(get(s"$base/search?q=")._2.contains(""""results":[]"""))
      assert(get(s"$base/search?q=zzznotaword")._2.contains(""""results":[]"""))

      // drain semantics: beginShutdown flips /health to 503 while /search
      // still answers (reference g_shutdown_in_progress behavior)
      server.beginShutdown()
      assert(get(s"$base/health")._1 == 503)
      assert(get(s"$base/search?q=alpha")._1 == 200)
    } finally server.stop()
  }
}
