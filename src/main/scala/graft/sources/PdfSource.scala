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

  /** The production recipe, kept as DATA (commands the reference runs,
    * pdf_processor.cpp:52-120) so a deployment with poppler + tesseract on
    * the executor image can wire it through a ProcessBuilder in one place.
    * Left unexecutable here by design — the sandbox has neither binary.
    */
  val ExternalProcessRecipe: Map[String, String] = Map(
    "pageCount" -> "pdfinfo <path> | grep '^Pages:'",
    "textLayer" -> "pdftotext -f <page> -l <page> <path> -",
    "ocr" -> "pdftoppm -r 200 -png -f <page> -l <page> <path> <tmp>/p && tesseract <tmp>/p-<page>.png stdout --psm 11"
  )

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

  def pages(
      spark: SparkSession,
      paths: Seq[String],
      extractor: PageExtractor
  ): (Dataset[Page], Dataset[BadFile]) = {
    import spark.implicits._
    val parallelism = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    val exploded: Dataset[RawPage] = spark
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
      // extraction (subprocess-shaped) must run ONCE even though the caller
      // consumes two outputs — cache the exploded pages, spill-safe
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (
      exploded.filter(_.bad_reason == null)
        .map(r => Page(r.file_name, r.file_type, r.source_path, r.page_number, r.text, r.did_ocr)),
      exploded.filter(_.bad_reason != null).map(r => BadFile(r.source_path, r.bad_reason))
    )
  }

  /** Pages as a DataFrame ready for the index build: doc text + metadata
    * columns matching the engine's source contract (doc ids are assigned
    * downstream by DocIdAssigner over (source_path, page_number)).
    */
  def pagesDF(spark: SparkSession, paths: Seq[String], extractor: PageExtractor): DataFrame =
    pages(spark, paths, extractor)._1.toDF()
}
