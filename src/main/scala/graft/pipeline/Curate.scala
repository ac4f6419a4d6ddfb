package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the flow a real corpus
  * runs before indexing/training, chaining the individually oracle-gated
  * operators end-to-end:
  *
  *   1. PII scrub (Pii.scrub): text is replaced by the redacted text;
  *      redaction counts feed the funnel report.
  *   2. exact dedup on the CLEAN text (Dedup.exactKeepers, keep-min rule —
  *      scrubbing first means two docs differing only in their PII dedup
  *      correctly).
  *   3. near-dup prune (Dedup.minhashNearDups -> transitive clusters ->
  *      keeper per cluster, Dedup.keepAfterNearDup).
  *   4. quality floor (TextStats.quality >= minQualityMicros).
  *
  * Returns the curated corpus plus a per-stage Funnel (the numbers an
  * orchestrator logs and alerts on). Every stage is one of the engine's
  * gate-checked operators, so the composition needs no oracle of its own —
  * correctness lives with each stage, THIS contract is the wiring order
  * (scrub before dedup; dedup before quality so a kept doc's duplicates
  * never resurrect it) and is spec-asserted on a corpus with planted PII /
  * dups / near-dups / junk.
  *
  * Scale shape: inherits each operator's (hash groupBy for exact; banded
  * LSH, only band keys shuffle, for near-dup; row-local exprs for scrub +
  * quality). The funnel costs one count per stage — O(stages) cheap jobs,
  * acceptable for a nightly curation run; pass `funnel = false` to skip
  * them and pay zero extra actions.
  */
object Curate {

  final case class Funnel(
      input: Long,
      piiRedactions: Long,
      afterExactDedup: Long,
      afterNearDup: Long,
      afterQuality: Long,
      // -1 when the optional substring-dup ceiling stage is disabled
      afterSubstringDup: Long = -1
  )

  /** Curated corpus (doc_id, text, source, lang — text is the REDACTED
    * text) and the stage funnel (all -1 when `funnel = false`).
    */
  /** `maxSubstringDupMicros` >= 0 enables the optional stage 3b: drop docs
    * whose distinct-window duplicated share (Dedup.substringDupStats,
    * window `substringW`) exceeds the cap — verbatim-heavy near-copies
    * that banded LSH can miss (long shared runs inside otherwise-different
    * shingle sets). Docs shorter than the window have no share and pass.
    */
  def curate(
      docs: DataFrame,
      w: Int = 3,
      jMicrosThreshold: Long = 300000L,
      minQualityMicros: Long = 200000L,
      funnel: Boolean = true,
      maxSubstringDupMicros: Long = -1L,
      substringW: Int = 8
  ): (DataFrame, Funnel) = {
    val meta = docs.columns.filter(c => c == "source" || c == "lang").map(col)

    // 1. scrub: redacted text replaces the original
    val scrubbed = Pii.scrub(docs)
    val clean = docs.select(Seq(col("doc_id")) ++ meta: _*)
      .join(scrubbed.select(col("doc_id"), col("clean_text").as("text")), Seq("doc_id"))
    val redactions =
      if (!funnel) -1L
      else scrubbed
        .agg(sum(col("n_email") + col("n_ipv4") + col("n_idnum")))
        .head().getLong(0)

    // 2. exact dedup on clean text (keep-min)
    val exact = clean
      .join(Dedup.exactKeepers(clean), Seq("doc_id"))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")

    // 3. near-dup prune (LSH pairs -> clusters -> keep one per cluster)
    val pairs = Dedup.minhashNearDups(exact, w, jMicrosThreshold)
    val nearKept = exact.join(Dedup.keepAfterNearDup(exact, pairs), Seq("doc_id"))

    // 3b. optional substring-dup ceiling (anti-join on violators, so docs
    // too short for a window — no stats row — pass through)
    val subKept =
      if (maxSubstringDupMicros < 0) nearKept
      else nearKept.join(
        Dedup.substringDupStats(nearKept, substringW)
          .filter(col("dup_micros") > maxSubstringDupMicros)
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")

    // 4. quality floor
    val curated = subKept
      .join(
        TextStats.quality(subKept)
          .filter(col("quality_micros") >= minQualityMicros)
          .select(col("doc_id")),
        Seq("doc_id"))

    val f =
      if (!funnel) Funnel(-1, redactions, -1, -1, -1)
      else Funnel(docs.count(), redactions, exact.count(), nearKept.count(), curated.count(),
        if (maxSubstringDupMicros < 0) -1 else subKept.count())
    (curated, f)
  }
}
