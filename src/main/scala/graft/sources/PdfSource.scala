package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

import graft.core.Tokenizer

/** S3 — PDF page source (reference `process_pdf`,
  * /root/reference/src/ingestion/pdf_processor.cpp:124-169), in Spark form:
  * a distributed flatMap from PDF file paths to per-PAGE document rows with
  * the reference's page loop, per-page OCR policy, and text-layer + OCR
  * merge semantics.
  *
  * The reference shells out per page (poppler `pdfinfo`/`pdftotext`, then
  * `pdftoppm` + `tesseract --psm 11` when the text layer is thin,
  * pdf_processor.cpp:52-120). Those binaries do not exist in this container,
  * so the extractor is a PLUGGABLE trait: production wires
  * [[ExternalProcessRecipe]] (the documented subprocess commands) behind the
  * same interface; specs wire a deterministic fake. Everything Spark-side is
  * real and tested: task distribution, per-FILE error isolation (a corrupt
  * PDF is routed to the bad side output and the partition survives — the
  * reference pipeline's swallow-and-continue, ingestion_pipeline.cpp:68-73),
  * page-row explosion, policy, and merge.
  */
object PdfSource {

  /** One emitted page — the reference's IngestedDocument shape for PDFs
    * (file_name, file_type="pdf", source_path, page_number 1-based, text,
    * did_ocr — pdf_processor.cpp:160-168).
    */
  final case class Page(
      file_name: String,
      file_type: String,
      source_path: String,
      page_number: Int,
      text: String,
      did_ocr: Boolean
  )

  final case class BadFile(source_path: String, reason: String)

  /** The per-page extraction seam. All three calls run ON EXECUTORS, one
    * file at a time — implementations must be Serializable and stateless.
    */
  trait PageExtractor extends Serializable {
    /** total pages; <= 0 or a throw marks the file bad (reference:
      * "Could not get page count or PDF has no pages").
      */
    def pageCount(path: String): Int
    /** embedded text layer of a 1-based page (`pdftotext -f p -l p`). */
    def textLayer(path: String, page: Int): String
    /** OCR of a rendered page (`pdftoppm -r 200 -png` + `tesseract --psm
      * 11`); only invoked when [[shouldOcrPage]] fires.
      */
    def ocr(path: String, page: Int): String
  }

  /** The PRODUCTION extractor: runs the reference's poppler/tesseract
    * commands through ProcessBuilder (no shell), mirroring
    * pdf_processor.cpp's popen semantics exactly:
    *
    *   - pageCount: `pdfinfo <path>` (stderr discarded), parse "Pages: N";
    *     empty output or no Pages line -> 0 (the caller marks the file bad,
    *     pdf_processor.cpp:52-79,129-131);
    *   - textLayer: `pdftotext -layout -f p -l p <path> -` — stdout is
    *     captured REGARDLESS of exit code (run_cmd_capture ignores pclose,
    *     pdf_processor.cpp:39-50), so a failing page yields an empty layer
    *     and falls through to the OCR policy rather than erroring;
    *   - ocr: render `pdftoppm -png -r 300 -f p -l p <path> <tmp>/p`, then
    *     `tesseract <tmp>/p-<page>.png stdout --psm 11`; a nonzero render, a
    *     missing image, or a tesseract failure returns "" (SOFT failure —
    *     the page keeps its thin text layer, pdf_processor.cpp:89-120).
    *
    * Hard failures — a binary missing from PATH (IOException) or a command
    * exceeding `timeoutSec` (a hung tesseract must not pin an executor core
    * forever; the process tree is destroyed) — propagate, so `pages` routes
    * the whole FILE to the bad side output.
    *
    * `pathPrepend` is prepended to the child PATH — production images point
    * it at their poppler/tesseract install; specs point it at stub scripts.
    */
  final class SubprocessExtractor(
      dpi: Int = 300,
      timeoutSec: Long = 300,
      pathPrepend: Option[String] = None
  ) extends PageExtractor {
    import SubprocessExtractor._

    def pageCount(path: String): Int = {
      val out = capture(Seq("pdfinfo", path), timeoutSec, pathPrepend)
      out.linesIterator
        .find(_.startsWith("Pages:"))
        .map { l =>
          val digits = l.drop(6).trim.takeWhile(_.isDigit)
          if (digits.isEmpty) 0 else digits.toInt
        }
        .getOrElse(0)
    }

    def textLayer(path: String, page: Int): String =
      capture(
        Seq("pdftotext", "-layout", "-f", page.toString, "-l", page.toString, path, "-"),
        timeoutSec, pathPrepend)

    def ocr(path: String, page: Int): String = {
      val tmp = java.nio.file.Files.createTempDirectory(
        s"pdfproc_${ProcessHandle.current().pid()}_${page}_")
      try {
        val prefix = tmp.resolve("p").toString
        val rendered = exitCode(
          Seq("pdftoppm", "-png", "-r", dpi.toString,
            "-f", page.toString, "-l", page.toString, path, prefix),
          timeoutSec, pathPrepend)
        if (rendered != 0) "" // soft: keep the thin text layer
        else {
          // reference expects p-<page>.png; poppler zero-pads for multi-digit
          // page counts (p-01.png), so fall back to the one rendered image
          val exact = tmp.resolve(s"p-$page.png")
          val img =
            if (java.nio.file.Files.exists(exact)) Some(exact)
            else {
              // poppler zero-pads (p-02.png) — take the one rendered image.
              // Close the directory stream explicitly: this fallback fires
              // for every page of a >=10-page PDF, and unclosed
              // DirectoryStreams hold an fd until GC.
              val ls = java.nio.file.Files.list(tmp)
              try {
                import scala.jdk.CollectionConverters._
                ls.iterator().asScala
                  .filter(_.getFileName.toString.endsWith(".png")).toSeq.sorted.headOption
              } finally ls.close()
            }
          img match {
            case None => "" // soft: render produced nothing
            case Some(i) =>
              capture(Seq("tesseract", i.toString, "stdout", "--psm", "11"), timeoutSec, pathPrepend)
          }
        }
      } finally {
        val walk = java.nio.file.Files.walk(tmp)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } finally walk.close()
      }
    }
  }

  object SubprocessExtractor {
    /** Run `cmd`, return its full stdout; stderr discarded; exit code IGNORED
      * (the reference's run_cmd_capture contract). Throws on missing binary
      * or timeout.
      */
    private[sources] def capture(
        cmd: Seq[String], timeoutSec: Long, pathPrepend: Option[String]): String =
      run(cmd, timeoutSec, pathPrepend)._2

    /** Run `cmd`, return its exit code (stdout drained and discarded). */
    private[sources] def exitCode(
        cmd: Seq[String], timeoutSec: Long, pathPrepend: Option[String]): Int =
      run(cmd, timeoutSec, pathPrepend)._1

    private def run(
        cmd: Seq[String], timeoutSec: Long, pathPrepend: Option[String]): (Int, String) = {
      // resolve the binary against pathPrepend OURSELVES (exec'ing an
      // absolute path) — ProcessBuilder's name-only lookup semantics vs the
      // child PATH are platform-murky, and specs must hit their stubs
      // deterministically
      val resolved = pathPrepend
        .map(d => java.nio.file.Paths.get(d, cmd.head))
        .filter(p => java.nio.file.Files.isExecutable(p))
        .map(_.toString)
        .getOrElse(cmd.head)
      val pb = new ProcessBuilder((resolved +: cmd.tail): _*)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      pathPrepend.foreach { p =>
        val env = pb.environment()
        env.put("PATH", p + java.io.File.pathSeparator + Option(env.get("PATH")).getOrElse(""))
      }
      val proc = pb.start()
      proc.getOutputStream.close()
      // drain stdout on a daemon thread: a same-thread read would block past
      // the timeout on a hung child that keeps the pipe open (the read only
      // unblocks at EOF, i.e. when the child dies)
      val buf = new java.io.ByteArrayOutputStream()
      val drainer = new Thread(() => {
        try {
          val in = proc.getInputStream
          val tmp = new Array[Byte](8192)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        } catch { case _: java.io.IOException => () } // pipe torn down on kill
      })
      drainer.setDaemon(true)
      drainer.start()
      val finished = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        proc.descendants().forEach(_.destroyForcibly())
        proc.destroyForcibly()
        throw new RuntimeException(s"${cmd.head} timed out after ${timeoutSec}s")
      }
      drainer.join(10000) // child exited; EOF is imminent
      (proc.exitValue(), new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Per-page OCR policy — the reference's `should_apply_ocr_for_page`
    * (pdf_processor.cpp:140-143 via ocr_policy): the text layer is too thin
    * when it has fewer than 50 bytes OR fewer than 10 indexing-tokenizer
    * tokens (same thresholds as the row-level policy, Ingest.withOcrPolicy).
    */
  def shouldOcrPage(textLayer: String): Boolean =
    textLayer.length < Ingest.MinTextChars ||
      Tokenizer.tokenize(textLayer).length < Ingest.MinTokenCount

  /** The reference's text merge when OCR fires (pdf_processor.cpp:145-153):
    * keep the text layer, ensure a trailing newline, append the OCR text.
    */
  def mergeOcr(textLayer: String, ocrText: String): String = {
    val base =
      if (textLayer.nonEmpty && !textLayer.endsWith("\n")) textLayer + "\n"
      else textLayer
    base + ocrText
  }

  /** Explode PDF paths into per-page rows. Returns (pages, badFiles):
    * a file whose page count fails or whose extraction throws lands in the
    * bad side output with its reason; other files are unaffected.
    */
  /** Internal union row: good pages carry a null bad_reason. (Public —
    * encoder codegen must reach it.)
    */
  final case class RawPage(
      file_name: String,
      file_type: String,
      source_path: String,
      page_number: Int,
      text: String,
      did_ocr: Boolean,
      bad_reason: String
  )

  /** The raw exploded page/bad union — extraction runs when consumed. */
  private def raw(
      spark: SparkSession,
      paths: Seq[String],
      extractor: PageExtractor
  ): Dataset[RawPage] = {
    import spark.implicits._
    val parallelism = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    spark
      .createDataset(paths)(Encoders.STRING)
      .repartition(parallelism) // one PDF can hide minutes of OCR — spread files, not bytes
      .flatMap { path =>
        try {
          val fileName = path.split('/').last
          val n = extractor.pageCount(path)
          if (n <= 0)
            Iterator.single(RawPage(fileName, "pdf", path, 0, "", did_ocr = false, "no_pages"))
          else {
            // materialize THIS file's pages eagerly: a lazy iterator would
            // throw during downstream consumption, OUTSIDE this try — a
            // page-3 extraction failure must mark the file bad (whole-file
            // isolation, reference swallow-and-continue), not kill the task.
            // Page counts are bounded (one file), so this doesn't buffer
            // unboundedly.
            (1 to n).map { p =>
              val layer = extractor.textLayer(path, p)
              val doOcr = shouldOcrPage(layer)
              val text = if (doOcr) mergeOcr(layer, extractor.ocr(path, p)) else layer
              RawPage(fileName, "pdf", path, p, text, doOcr, null)
            }.iterator
          }
        } catch {
          case e: Exception =>
            Iterator.single(RawPage(
              path.split('/').last, "pdf", path, 0, "", did_ocr = false,
              s"extract_failed: ${e.getMessage}"))
        }
      }
  }

  /** Scoped two-output access: extraction (subprocess-shaped, the dominant
    * cost) runs ONCE for both outputs via a spill-safe cache that is
    * RELEASED when `use` returns — nothing stays in executor storage after
    * the operator completes (a long-lived pipeline driver must not
    * accumulate cached page blocks across ingest jobs).
    */
  def pages[T](
      spark: SparkSession,
      paths: Seq[String],
      extractor: PageExtractor
  )(use: (Dataset[Page], Dataset[BadFile]) => T): T = {
    import spark.implicits._
    val exploded = raw(spark, paths, extractor)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      use(
        exploded.filter(_.bad_reason == null)
          .map(r => Page(r.file_name, r.file_type, r.source_path, r.page_number, r.text, r.did_ocr)),
        exploded.filter(_.bad_reason != null).map(r => BadFile(r.source_path, r.bad_reason))
      )
    } finally exploded.unpersist()
  }

  /** Pages as a DataFrame ready for the index build: doc text + metadata
    * columns matching the engine's source contract (doc ids are assigned
    * downstream by DocIdAssigner over (source_path, page_number)). Single
    * consumer — extraction runs once with no caching at all.
    */
  def pagesDF(spark: SparkSession, paths: Seq[String], extractor: PageExtractor): DataFrame = {
    import spark.implicits._
    raw(spark, paths, extractor)
      .filter(_.bad_reason == null)
      .map(r => Page(r.file_name, r.file_type, r.source_path, r.page_number, r.text, r.did_ocr))
      .toDF()
  }
}
