package graft.app

import java.net.{HttpURLConnection, URL, URLEncoder}
import java.nio.file.Files

import graft.SparkTestBase
import graft.index.{SegmentIndex, TenantCatalog}
import graft.search.SegmentSearch

/** Multi-tenant catalog + gateway spec: per-tenant builds are PROVABLY
  * isolated (scores equal a standalone index over only that tenant's docs —
  * N/avgdl/df all tenant-local), tenant ids round-trip through directory
  * sanitization, and the gateway routes /search by tenant with lazy loading
  * and LRU eviction bounded by maxLoaded.
  */
class TenantSpec extends SparkTestBase {

  private def get(url: String, apiKey: Option[String] = None): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(2000)
    conn.setReadTimeout(15000)
    apiKey.foreach(conn.setRequestProperty("X-Api-Key", _))
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  private def corpus = {
    val sp = spark
    import sp.implicits._
    // "shared" appears in every tenant but with different corpus shapes, so
    // isolated stats MUST produce different scores than pooled stats would
    Seq(
      (1L, "shared alpha bravo", "acme", "en"),
      (2L, "shared shared charlie", "acme", "en"),
      (3L, "delta echo foxtrot golf hotel india juliet", "acme", "en"),
      (4L, "shared bravo", "Beta Corp!", "de"),
      (5L, "charlie delta", "Beta Corp!", "de"),
      (6L, "shared shared shared echo", "γ", "fr")
    ).toDF("doc_id", "text", "source", "lang")
  }

  test("catalog: per-tenant builds isolate corpus statistics exactly") {
    val root = Files.createTempDirectory("graft-tenants").toString
    val counts = TenantCatalog.buildAll(corpus, root, buckets = 2)
    assert(counts == Map("acme" -> 3L, "Beta Corp!" -> 2L, "γ" -> 1L))
    assert(TenantCatalog.tenants(root) == Seq("Beta Corp!", "acme", "γ"))

    // a hand-created dir whose name is not valid percent-encoding must not
    // take down the listing (it can never be routed to anyway — sanitize
    // would re-encode the '%'); it is skipped, the rest still list
    Files.createDirectories(java.nio.file.Paths.get(root, "tenants", "bad%zz"))
    assert(TenantCatalog.tenants(root) == Seq("Beta Corp!", "acme", "γ"))

    // tenant dirs are sanitized but decodable
    assert(TenantCatalog.sanitize("Beta Corp!") == "Beta%20Corp%21")
    assert(TenantCatalog.sanitize("γ") == "%CE%B3")
    assert(TenantCatalog.sanitize("a.b_c-D9") == "a.b_c-D9")
    // a leading '.' is always encoded: "." / ".." must never traverse out
    // of the tenants/ directory
    assert(TenantCatalog.sanitize(".") == "%2E")
    assert(TenantCatalog.sanitize("..") == "%2E.")
    assert(TenantCatalog.sanitize(".hidden") == "%2Ehidden")
    assert(!java.nio.file.Paths.get(TenantCatalog.tenantDir(root, ".."))
      .normalize().toString.stripSuffix("/").equals(root))
    intercept[IllegalArgumentException](TenantCatalog.sanitize(null))

    // isolation proof: tenant acme's index == a standalone index built over
    // ONLY acme's docs — same meta (N, sumDl) and same ranked scores
    val solo = Files.createTempDirectory("graft-solo").toString
    SegmentIndex.build(corpus.filter("source = 'acme'"), solo, buckets = 2)
    val tDir = TenantCatalog.tenantDir(root, "acme")
    val mT = SegmentIndex.readMeta(tDir)
    val mS = SegmentIndex.readMeta(solo)
    assert((mT.n, mT.sumDl) == (mS.n, mS.sumDl))
    val hitsT = SegmentSearch.searchBatch(spark, tDir, Seq("shared charlie"), 10)(0)
    val hitsS = SegmentSearch.searchBatch(spark, solo, Seq("shared charlie"), 10)(0)
    assert(hitsT == hitsS, s"tenant=$hitsT solo=$hitsS")
    assert(hitsT.nonEmpty && hitsT.map(_._1).forall(Set(1L, 2L, 3L)))

    // the same query against tenant γ sees γ's OWN stats: its single doc has
    // df=1, N=1 — scores cannot match acme's
    val hitsG = SegmentSearch.searchBatch(spark, TenantCatalog.tenantDir(root, "γ"), Seq("shared"), 10)(0)
    assert(hitsG.map(_._1) == Seq(6L))
  }

  test("catalog: addAll appends per-tenant deltas; results match a fresh full build") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft-tenants-add").toString
    TenantCatalog.buildAll(corpus, root, buckets = 2)

    val delta = Seq(
      (10L, "shared golf hotel", "acme", "en"),
      (11L, "shared newco charter", "newco", "en") // tenant not yet in the catalog
    ).toDF("doc_id", "text", "source", "lang")
    val counts = TenantCatalog.addAll(delta, root, buckets = 1)
    // addAll reports the docs INGESTED BY THE DELTA (acme already held 3;
    // this run added 1), not post-add totals — ingest monitoring reads this
    assert(counts == Map("acme" -> 1L, "newco" -> 1L), counts)
    assert(SegmentIndex.readMeta(TenantCatalog.tenantDir(root, "acme")).n == 4L)

    // append ≡ rebuild: a fresh catalog over the FULL corpus must answer
    // identically (N/sumDl/df are exact integers regardless of segmentation)
    val root2 = Files.createTempDirectory("graft-tenants-full").toString
    TenantCatalog.buildAll(corpus.union(delta), root2, buckets = 2)
    Seq("shared", "shared charlie", "golf hotel").foreach { q =>
      val a = SegmentSearch.searchBatch(spark, TenantCatalog.tenantDir(root, "acme"), Seq(q), 10)(0)
      val b = SegmentSearch.searchBatch(spark, TenantCatalog.tenantDir(root2, "acme"), Seq(q), 10)(0)
      assert(a == b, s"q=$q append=$a rebuild=$b")
    }

    // untouched tenants stay untouched; the bootstrapped tenant serves
    assert(SegmentIndex.readMeta(TenantCatalog.tenantDir(root, "Beta Corp!")).n == 2L)
    val hitsNew = SegmentSearch.searchBatch(spark, TenantCatalog.tenantDir(root, "newco"), Seq("shared"), 10)(0)
    assert(hitsNew.map(_._1) == Seq(11L))
  }

  test("catalog: numeric-looking tenant ids never merge through the staged read") {
    // partition-column TYPE INFERENCE would parse dirs "7" and "007" into
    // the same integer value and silently merge the tenants — the staged
    // read pins the partition column to string via an explicit schema
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha bravo", "7", "en"),
      (2L, "charlie delta", "007", "en"),
      (3L, "echo foxtrot", "7", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val root = Files.createTempDirectory("graft-tenants-num").toString
    val counts = TenantCatalog.buildAll(docs, root, buckets = 1)
    assert(counts == Map("7" -> 2L, "007" -> 1L), counts)
    val hits7 = SegmentSearch.searchBatch(spark, TenantCatalog.tenantDir(root, "7"), Seq("alpha OR charlie OR echo"), 10)(0)
    val hits007 = SegmentSearch.searchBatch(spark, TenantCatalog.tenantDir(root, "007"), Seq("alpha OR charlie OR echo"), 10)(0)
    assert(hits7.map(_._1).toSet == Set(1L, 3L), hits7)
    assert(hits007.map(_._1) == Seq(2L), hits007)
  }

  test("gateway: routes by tenant, 400/404 contract, LRU eviction, reload") {
    val root = Files.createTempDirectory("graft-tenants-http").toString
    TenantCatalog.buildAll(corpus, root, buckets = 2)

    val server = TenantServer.start(root, port = 0, maxLoaded = 1)
    val base = s"http://127.0.0.1:${server.port}"
    try {
      var healthy = false
      var tries = 0
      while (!healthy && tries < 50) {
        try healthy = get(s"$base/health") == ((200, "OK"))
        catch { case _: Exception => Thread.sleep(50) }
        tries += 1
      }
      assert(healthy, "/health never returned 200 OK")

      // the gateway serves the same built-in UI as the engine server (the
      // page's relative URLs + X-Api-Key field work against gateway auth)
      val (cUi, ui) = get(s"$base/")
      assert(cUi == 200 && ui.contains("graft search") && ui.contains("apikey"), ui.take(120))
      assert(get(s"$base/not-a-route")._1 == 404)

      // catalog listing (decoded ids)
      val (cT, tenants) = get(s"$base/tenants")
      assert(cT == 200 && tenants.contains("\"acme\"") &&
        tenants.contains("\"Beta Corp!\"") && tenants.contains("\"γ\""), tenants)

      // param contract
      assert(get(s"$base/search?q=shared")._1 == 400)
      assert(get(s"$base/search?tenant=nosuch&q=shared")._1 == 404)

      // tenant-routed search answers from the tenant's own index
      def enc(s: String) = URLEncoder.encode(s, "UTF-8")
      val (c1, acme) = get(s"$base/search?tenant=acme&q=shared+charlie&k=5")
      assert(c1 == 200, acme)
      val acmeIds = """"docId":(\d+)""".r.findAllMatchIn(acme).map(_.group(1).toLong).toSeq
      assert(acmeIds.nonEmpty && acmeIds.forall(Set(1L, 2L, 3L)), acme)

      val (c2, beta) = get(s"$base/search?tenant=${enc("Beta Corp!")}&q=shared&k=5")
      assert(c2 == 200, beta)
      val betaIds = """"docId":(\d+)""".r.findAllMatchIn(beta).map(_.group(1).toLong).toSeq
      assert(betaIds == Seq(4L), beta)

      // maxLoaded=1: serving Beta evicted acme
      assert(server.loadedTenants == Seq("Beta Corp!"), server.loadedTenants)

      // evicted tenant transparently reloads on the next request
      val (c3, acme2) = get(s"$base/search?tenant=acme&q=shared+charlie&k=5")
      assert(c3 == 200 && acme2 == acme)
      assert(server.loadedTenants == Seq("acme"))

      // per-tenant hot reload
      val (cR, rBody) = get(s"$base/reload?tenant=acme")
      assert(cR == 200 && rBody.contains("\"reloaded\":true") && rBody.contains("\"docs\":3"), rBody)
      assert(get(s"$base/search?tenant=acme&q=shared+charlie&k=5")._2 == acme)

      // unicode tenant id round-trips through the URL and the directory
      val (c4, g) = get(s"$base/search?tenant=${enc("γ")}&q=shared")
      assert(c4 == 200, g)
      assert(""""docId":(\d+)""".r.findAllMatchIn(g).map(_.group(1)).toSeq == Seq("6"), g)
    } finally server.stop()
  }

  test("auth: API keys bind tenants, roles gate reload, rate limits meter usage") {
    val root = Files.createTempDirectory("graft-tenants-auth").toString
    TenantCatalog.buildAll(corpus, root, buckets = 2)
    val kRead = ApiKeys.issue(root, "acme", "read", ratePerSec = 1000, burst = 1000)
    val kAdmin = ApiKeys.issue(root, "acme", "admin", ratePerSec = 1000, burst = 1000)
    val kBeta = ApiKeys.issue(root, "Beta Corp!", "read", ratePerSec = 0.001, burst = 2)

    // hashes at rest, never plaintext
    val keyFile = Files.readString(java.nio.file.Paths.get(root, "apikeys.json"))
    Seq(kRead, kAdmin, kBeta).foreach(k => assert(!keyFile.contains(k)))
    assert(keyFile.contains(ApiKeys.sha256Hex(kRead)))

    val server = TenantServer.start(root, port = 0, auth = ApiKeys.load(root))
    val base = s"http://127.0.0.1:${server.port}"
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    try {
      def healthy(): Boolean =
        try get(s"$base/health")._1 == 200
        catch { case _: Exception => false }
      var tries = 0
      while (tries < 50 && !healthy()) { Thread.sleep(50); tries += 1 }
      assert(healthy(), "/health never returned 200 OK")

      // authentication: no key / bad key -> 401 (tenant existence not probed)
      assert(get(s"$base/search?tenant=acme&q=shared")._1 == 401)
      assert(get(s"$base/search?tenant=acme&q=shared", Some("gk_bogus"))._1 == 401)
      assert(get(s"$base/search?tenant=nosuch&q=shared")._1 == 401)

      // authorization: a key serves ONLY its own tenant
      val (cOk, body) = get(s"$base/search?tenant=acme&q=shared+charlie&k=5", Some(kRead))
      assert(cOk == 200, body)
      assert(""""docId":(\d+)""".r.findAllMatchIn(body).nonEmpty)
      assert(get(s"$base/search?tenant=${enc("Beta Corp!")}&q=shared", Some(kRead))._1 == 403)

      // RBAC: reload needs admin
      assert(get(s"$base/reload?tenant=acme", Some(kRead))._1 == 403)
      assert(get(s"$base/reload?tenant=acme", Some(kAdmin))._1 == 200)

      // rate limit: burst 2 at ~zero refill -> two 200s then 429
      val betaUrl = s"$base/search?tenant=${enc("Beta Corp!")}&q=shared"
      assert(get(betaUrl, Some(kBeta))._1 == 200)
      assert(get(betaUrl, Some(kBeta))._1 == 200)
      assert(get(betaUrl, Some(kBeta))._1 == 429)

      // key= query param is NOT accepted (plaintext creds in logs/proxies) —
      // a valid key presented that way is still a 401
      assert(get(s"$base/search?tenant=acme&q=shared&key=${enc(kRead)}")._1 == 401)
      // header path still works after the rejected attempt
      assert(get(s"$base/search?tenant=acme&q=shared", Some(kRead))._1 == 200)

      // /tenants is scoped to the caller's tenant under auth
      assert(get(s"$base/tenants")._1 == 401)
      val (_, tl) = get(s"$base/tenants", Some(kRead))
      assert(tl.contains("\"acme\"") && !tl.contains("Beta Corp!"), tl)

      // usage metering: admin sees its tenant's allowed/denied counters
      assert(get(s"$base/usage", Some(kRead))._1 == 403)
      val (cU, usage) = get(s"$base/usage", Some(kAdmin))
      assert(cU == 200, usage)
      val allowed = """"allowed":(\d+)""".r.findFirstMatchIn(usage).map(_.group(1).toInt)
      val denied = """"denied":(\d+)""".r.findFirstMatchIn(usage).map(_.group(1).toInt)
      assert(usage.contains("\"acme\""), usage)
      assert(allowed.exists(_ >= 3), usage) // kRead searches (x2) + kAdmin reload
      assert(denied.exists(_ >= 2), usage)  // cross-tenant 403 + read-key reload 403
    } finally server.stop()
  }
}
