package graft.app

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ExecutorService, Executors}
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.JsonText.esc
import graft.core.QueryParser
import graft.index.SegmentIndex
import graft.search.SegmentSearch

/** Long-running HTTP serving endpoint — the twin of the reference's searchd
  * (/root/reference/apps/searchd/main.cpp:423-489):
  *
  *   GET /health      -> 200 "OK" when ready and not shutting down, 503 else
  *   GET /search?q&k  -> {"query":q,"results":[{docId,score,snippet,source,lang}]}
  *                       k = max(1, k), default 10, invalid k ignored
  *
  * Serves from a warmed in-memory segment index (ServingEngine: pinned
  * segments, cached idfs, per-segment parallel scoring within a request) plus
  * an in-memory docstore for snippet/metadata decoration (the searchd memory
  * model). JDK com.sun.net.httpserver — zero new dependencies.
  *
  * Usage: SearchServer <indexDir> [port]   (port 0 = ephemeral)
  */
object SearchServer {

  final case class DocRow(text: String, source: String, lang: String)

  /** Handle to a started server. `beginShutdown()` flips /health to 503
    * (drain phase — a load balancer stops routing while in-flight /search
    * requests still complete, the reference's g_shutdown_in_progress
    * semantics); `stop()` then closes sockets and workers.
    */
  final class Running private[SearchServer] (http: HttpServer, ready: AtomicBoolean) {
    def port: Int = http.getAddress.getPort
    def beginShutdown(): Unit = ready.set(false)
    def stop(delaySeconds: Int = 0): Unit = {
      ready.set(false)
      http.stop(delaySeconds)
      http.getExecutor match {
        case e: ExecutorService => e.shutdownNow()
        case _ =>
      }
    }
  }

  /** Start serving; returns the running handle (caller stops it). */
  def start(
      engine: SegmentSearch.ServingEngine,
      docs: Long => Option[DocRow],
      port: Int
  ): Running = {
    val ready = new AtomicBoolean(true)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    // daemon workers: an embedding JVM (bench, spec) exits cleanly after
    // stop(); the standalone main stays alive via its explicit join
    server.setExecutor(Executors.newFixedThreadPool(
      math.max(8, Runtime.getRuntime.availableProcessors()),
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t }))

    server.createContext("/health", (ex: HttpExchange) => {
      val (code, body) = if (ready.get) (200, "OK") else (503, "")
      respond(ex, code, "text/plain", body)
    })

    server.createContext("/search", (ex: HttpExchange) => {
      try {
        val params = queryParams(ex)
        val q = params.getOrElse("q", "")
        val k = math.max(1, params.get("k").flatMap(_.toIntOption).getOrElse(10))
        val pq = QueryParser.parse(q)
        val top = engine.search(pq, k)
        val body = top.map { case (docId, score) =>
          val d = docs(docId).getOrElse(DocRow("", "", ""))
          val snippet = graft.core.Snippets.makeSnippet(d.text, pq.terms)
          s"""{"docId":$docId,"score":$score,"snippet":"${esc(snippet)}",""" +
            s""""source":"${esc(d.source)}","lang":"${esc(d.lang)}"}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, "application/json", s"""{"query":"${esc(q)}","results":$body}""")
      } catch {
        case e: Exception => respond(ex, 500, "text/plain", s"error: ${e.getMessage}")
      }
    })

    server.start()
    new Running(server, ready)
  }

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes)
      finally os.close()
    }
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split('&').filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) => Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.toMap
  }

  /** Pin a docstore in memory for snippet/metadata decoration. */
  def docMapFromStore(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String
  ): Map[Long, DocRow] =
    spark.read.parquet(s"$indexDir/docstore")
      .select("doc_id", "text", "source", "lang")
      .collect()
      .map(r => r.getLong(0) -> DocRow(r.getString(1), r.getString(2), r.getString(3)))
      .toMap

  /** Load everything into memory from an on-disk index dir (Spark used only
    * for the one-time docstore read, then stopped — serving is Spark-free).
    */
  def load(indexDir: String): (SegmentSearch.ServingEngine, Map[Long, DocRow]) = {
    val meta = SegmentIndex.readMeta(indexDir)
    val segs = SegmentIndex.segmentFiles(indexDir).map(SegmentIndex.loadSegment(_)).toIndexedSeq
    val spark = graft.spark.Sessions.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      shufflePartitions = 8,
      appName = "graft-searchd-load")
    spark.sparkContext.setLogLevel("WARN")
    val docMap =
      try docMapFromStore(spark, indexDir)
      finally spark.stop()
    (new SegmentSearch.ServingEngine(segs, meta), docMap)
  }

  /** Exit codes mirror the reference CLI discipline
    * (tests/test_cli_exit_codes.cpp): 2 usage, 3 runtime (load) failure —
    * and failure ordering: the index loads BEFORE any port binding is
    * attempted (tests/test_runtime_failure_ordering.cpp).
    */
  /** Ordered exit-2 argument validation (unknown flag -> arity -> port
    * value), testable in-process by CliSpec. Right((indexDir, port)).
    */
  def parseArgs(args: Array[String]): Either[String, (String, Int)] = {
    val flags = args.filter(_.startsWith("--")).toIndexedSeq
    val pos = args.filterNot(_.startsWith("--")).toIndexedSeq
    if (flags.nonEmpty) Left(s"unknown flag: ${flags.head}")
    else if (pos.isEmpty) Left("missing required <indexDir>")
    else if (pos.length > 2) Left(s"unexpected argument: ${pos(2)}")
    else pos.lift(1) match {
      case None => Right((pos(0), 8080))
      case Some(p) => p.toIntOption.filter(v => v >= 0 && v <= 65535) match {
        case Some(v) => Right((pos(0), v))
        case None => Left(s"invalid port: $p")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val (indexDir, port) = parseArgs(args) match {
      case Left(msg) =>
        System.err.println(s"SearchServer: $msg")
        System.err.println("usage: SearchServer <indexDir> [port]")
        sys.exit(2)
      case Right(v) => v
    }
    val (engine, docMap) =
      try load(indexDir)
      catch {
        case e: Exception =>
          System.err.println(s"failed to load index '$indexDir': ${e.getMessage}")
          sys.exit(3)
      }
    val running = start(engine, docMap.get, port)
    // Port binding succeeded before this line prints (reference contract:
    // exactly one startup message after successful bind, main.cpp:497-520).
    println(s"Server started on port ${running.port} using index: $indexDir")
    sys.addShutdownHook(running.beginShutdown()) // drain semantics on SIGTERM
    Thread.currentThread.join() // serve until killed
  }
}
