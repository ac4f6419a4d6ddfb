package graft.app

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Executes the built-in UI's REAL page script (fetched from a live server)
  * under node with a minimal DOM shim — the flows (search + highlighting,
  * debounced /suggest, /didyoumean, wildcard mode) run over actual HTTP
  * against the serving engine, which ScalaTest alone cannot do for browser
  * JS. Opportunistic like the poppler PDF test: cancels cleanly when no
  * node runtime is on PATH.
  */
class UiFlowSpec extends SparkTestBase {

  private def nodeOnPath: Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparatorChar)
      .map(d => Paths.get(d, "node"))
      .find(p => Files.isRegularFile(p) && Files.isExecutable(p))
      .map(_.toString)

  test("UI page script drives search/suggest/didyoumean/wildcard over real HTTP (node)") {
    val node = nodeOnPath
    assume(node.isDefined, "no node runtime on PATH — UI flow drive skipped")

    val sp = spark
    import sp.implicits._
    // vocabulary shaped for every flow: prefix "alp", lev-1 "alphz"->alpha,
    // glob "al*a", and co-occurring terms for the AND search
    val docs = Seq(
      (1L, "alpha bravo charlie", "repoA", "en"),
      (2L, "alpha bravo delta", "repoB", "en"),
      (3L, "alpine bravo echo", "repoA", "de"),
      (4L, "alpha foxtrot", "repoC", "fr")
    ).toDF("doc_id", "text", "source", "lang")
    val dir = Files.createTempDirectory("graft-uiflow").toString
    SegmentIndex.build(docs, dir, buckets = 2)
    val meta = SegmentIndex.readMeta(dir)
    val segs = SegmentIndex.liveSegmentFiles(dir).map(SegmentIndex.loadSegment(_)).toIndexedSeq
    val docMap = spark.read.parquet(s"$dir/docstore")
      .select("doc_id", "text", "source", "lang").collect()
      .map(r => r.getLong(0) -> SearchServer.DocRow(r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    val server = SearchServer.start(new SegmentSearch.ServingEngine(segs, meta), docMap.get, port = 0)
    try {
      val harness = {
        val tmp = Files.createTempFile("graft-ui-harness", ".js")
        val in = getClass.getResourceAsStream("/ui_flow_harness.js")
        try Files.write(tmp, in.readAllBytes()) finally in.close()
        tmp.toString
      }
      val out = new StringBuilder
      val exit = scala.sys.process.Process(
        Seq(node.get, harness),
        None,
        "GRAFT_UI_BASE" -> s"http://127.0.0.1:${server.port}"
      ).!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
      assert(exit == 0, s"node harness failed:\n$out")
      assert(out.toString.contains("UI HARNESS: ALL FLOWS OK"), out.toString)
    } finally server.stop()
  }

  test("UI page script searches through the tenant gateway with the api-key field (node)") {
    val node = nodeOnPath
    assume(node.isDefined, "no node runtime on PATH — UI flow drive skipped")

    val sp = spark
    import sp.implicits._
    val corpus = Seq(
      (1L, "alpha bravo charlie", "acme", "en"),
      (2L, "alpha bravo delta", "acme", "en"),
      (3L, "alpha foxtrot", "acme", "fr")
    ).toDF("doc_id", "text", "source", "lang")
    val root = Files.createTempDirectory("graft-uiflow-tenant").toString
    graft.index.TenantCatalog.buildAll(corpus, root, buckets = 2)
    val key = ApiKeys.issue(root, "acme", "read", ratePerSec = 1000, burst = 1000)
    val server = TenantServer.start(root, port = 0, auth = ApiKeys.load(root))
    try {
      val harness = {
        val tmp = Files.createTempFile("graft-ui-harness", ".js")
        val in = getClass.getResourceAsStream("/ui_flow_harness.js")
        try Files.write(tmp, in.readAllBytes()) finally in.close()
        tmp.toString
      }
      val out = new StringBuilder
      val exit = scala.sys.process.Process(
        Seq(node.get, harness),
        None,
        "GRAFT_UI_BASE" -> s"http://127.0.0.1:${server.port}",
        "GRAFT_UI_APIKEY" -> key,
        "GRAFT_UI_TENANT" -> "acme",
        "GRAFT_UI_FLOWS" -> "search" // the gateway mounts /search only
      ).!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
      assert(exit == 0, s"node harness (gateway) failed:\n$out")
      assert(out.toString.contains("UI HARNESS: ALL FLOWS OK"), out.toString)
    } finally server.stop()
  }
}
