package graft.index

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-tenant index catalog — the reference's Phase 5 commercial fork
  * ("Multi-tenancy: isolate many customers' data — design tenant-aware",
  * /root/reference/COMMERCIAL_ROADMAP.md:67,105; target architecture
  * "Storage: per-tenant index + object store", :93).
  *
  * Tenant model: ONE SegmentIndex PER TENANT under `rootDir/tenants/<id>/`.
  * This is stronger than a metadata filter over a shared index: every
  * corpus statistic (N, avgdl, df, idf) is computed from the tenant's OWN
  * corpus, so tenant A's ranking is provably independent of tenant B's data
  * (a filter keeps global stats and leaks corpus-shape information across
  * tenants through the scores). Isolation is also operational: per-tenant
  * builds, incremental adds, compaction, and hot reloads never touch other
  * tenants' files.
  *
  * Scale shape (100 TB, T tenants): `buildAll` makes exactly ONE pass over
  * the full corpus (a `partitionBy(tenant)` staging write — tenant dirs are
  * the unit of object-store layout), then each tenant's build reads ONLY its
  * partition via partition pruning. Total corpus bytes read ~ 2x, never
  * O(T) passes. The per-tenant builds are independent Spark jobs — a real
  * deployment runs them concurrently or per-tenant-on-demand; each inherits
  * SegmentIndex's own exchange-free build plan. A corpus already laid out
  * tenant-partitioned (the steady state) passes `stage = false` and skips
  * the staging copy entirely.
  */
object TenantCatalog {

  /** Path-safe tenant id: [A-Za-z0-9._-] kept, everything else %XX-encoded
    * (UTF-8). Deterministic and collision-free, so tenant ids are arbitrary
    * strings while directory names stay portable. A LEADING '.' is always
    * encoded: "." and ".." would otherwise pass through verbatim and
    * `tenantDir` would escape the tenants/ directory (path traversal into
    * the catalog root).
    */
  def sanitize(tenant: String): String = {
    require(tenant != null, "tenant id must not be null")
    val sb = new StringBuilder
    var first = true
    tenant.getBytes("UTF-8").foreach { b =>
      val c = b.toChar
      val keep = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        (c == '.' && !first) || c == '_' || c == '-'
      if (keep) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
      first = false
    }
    sb.toString
  }

  def tenantDir(rootDir: String, tenant: String): String =
    s"$rootDir/tenants/${sanitize(tenant)}"

  /** Tenant ids present under `rootDir` (decoded from their directory
    * names).
    */
  def tenants(rootDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val base = Paths.get(rootDir, "tenants")
    if (!Files.isDirectory(base)) return Nil
    val s = Files.list(base)
    try s.iterator().asScala
      .filter(Files.isDirectory(_))
      // sanitize() percent-encodes, so committed dirs always decode; a
      // hand-created dir with a stray '%' would make URLDecoder throw and
      // take down the whole listing (and TenantServer startup) — skip such
      // entries instead of failing the catalog
      .flatMap { p =>
        val name = p.getFileName.toString
        try Some(java.net.URLDecoder.decode(name, "UTF-8"))
        catch {
          case _: IllegalArgumentException =>
            Console.err.println(s"[tenants] skipping undecodable tenant dir: $name")
            None
        }
      }
      .toSeq.sorted
    finally s.close()
  }

  /** Build (or rebuild) one SegmentIndex per tenant.
    *
    * @param docs      corpus with a string tenant column (doc_id, text,
    *                  source, lang, ...); doc_ids stay global — a tenant's
    *                  index simply holds the subset
    * @param tenantCol the tenant key column (this corpus uses `source` as
    *                  the tenant twin)
    * @param only      restrict to these tenants (None = every tenant in the
    *                  corpus). The staging pass still covers the full corpus
    *                  so later builds of other tenants reuse it.
    * @param stage     when false, `docs` is trusted to already be
    *                  tenant-partitioned at its source (predicate pushdown
    *                  makes the per-tenant read O(tenant)); no staging copy
    * @return tenant -> doc count, for every tenant built
    */
  def buildAll(
      docs: DataFrame,
      rootDir: String,
      buckets: Int,
      tenantCol: String = "source",
      only: Option[Seq[String]] = None,
      codeAware: Boolean = false,
      stage: Boolean = true
  ): Map[String, Long] =
    runPerTenant(docs, rootDir, tenantCol, only, stage) { (tdocs, dir) =>
      SegmentIndex.build(tdocs, dir, buckets, codeAware)
    }

  /** Incrementally add a delta corpus across tenants: each tenant's rows
    * are APPENDED to its existing index as new segments (the append-only
    * model — bit-identical to a full rebuild by the SegmentSpec add-parity
    * guarantee), and a tenant not yet in the catalog is bootstrapped as a
    * fresh build. The daily-delta ingest shape: one staged pass over the
    * delta, per-tenant pruned appends, then the gateway's per-tenant delta
    * /reload picks up only the new segments.
    *
    * @param buckets segment-bucket count for each tenant's DELTA (sized to
    *                the delta, not the corpus)
    */
  def addAll(
      docs: DataFrame,
      rootDir: String,
      buckets: Int,
      tenantCol: String = "source",
      only: Option[Seq[String]] = None,
      codeAware: Boolean = false,
      stage: Boolean = true
  ): Map[String, Long] =
    runPerTenant(docs, rootDir, tenantCol, only, stage, delta = true) { (tdocs, dir) =>
      SegmentIndex.addDocuments(tdocs, dir, buckets, codeAware)
    }

  /** Shared staging + per-tenant dispatch for buildAll/addAll: one
    * tenant-partitioned pass over the corpus, then `op` runs on each
    * tenant's pruned slice. Returns tenant -> docs INGESTED BY THIS RUN:
    * the post-op total for builds, the post-minus-pre delta for `delta`
    * mode (reporting the post-add total as the delta's ingest count would
    * silently inflate ingest-size monitoring built on the job output).
    */
  private def runPerTenant(
      docs: DataFrame,
      rootDir: String,
      tenantCol: String,
      only: Option[Seq[String]],
      stage: Boolean,
      delta: Boolean = false
  )(op: (DataFrame, String) => Unit): Map[String, Long] = {
    val spark = docs.sparkSession
    Files.createDirectories(Paths.get(rootDir))
    // Stage partitioned by the SANITIZED tenant id: partition directory
    // names must be path-safe (arbitrary tenant strings — spaces, unicode —
    // break filesystem/locale assumptions), and sanitize is exactly the
    // path-safe bijection the tenant dirs already use. A null tenant value
    // fails the build LOUDLY (sanitize's require) — one bad row must never
    // silently vanish from, or crash into, another tenant's corpus.
    val sanitizeUdf = udf((s: String) =>
      sanitize(if (s == null) throw new IllegalArgumentException(
        s"null tenant value (column '$tenantCol')") else s))
    val source: DataFrame =
      if (!stage) docs
      else {
        val staging = s"$rootDir/_staging"
        val staged = docs
          .withColumn("__tenant_dir", sanitizeUdf(col(tenantCol).cast("string")))
        staged.write.mode("overwrite").partitionBy("__tenant_dir").parquet(staging)
        // read back with the WRITTEN schema: partition-column type inference
        // would otherwise parse numeric-looking tenant dirs (e.g. "7" and
        // "007") into the same integer value, silently MERGING distinct
        // tenants — the exact isolation breach this class exists to prevent.
        // An explicit schema pins __tenant_dir to string, no inference.
        spark.read.schema(staged.schema).parquet(staging)
      }
    val all: Seq[String] = only.getOrElse(
      source.select(col(tenantCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
        .map { t =>
          require(t != null, s"null tenant value (column '$tenantCol')")
          t
        }.sorted)
    all.map { t =>
      // staged reads prune on the partition column (O(tenant) bytes read);
      // unstaged corpora fall back to a pushed-down value filter
      val tdocs =
        if (stage) source.filter(col("__tenant_dir") === sanitize(t)).drop("__tenant_dir")
        else source.filter(col(tenantCol).cast("string") === t)
      val dir = tenantDir(rootDir, t)
      val before =
        if (delta && Files.exists(Paths.get(dir, "index_meta.json")))
          SegmentIndex.readMeta(dir).n
        else 0L
      op(tdocs, dir)
      // write doc sidecars NOW, while a Spark session is up: the serving
      // gateway then cold-loads any tenant without touching Spark (the
      // backfill fallback would otherwise spin a session per cold tenant).
      // addDocuments writes delta-bucket sidecars itself; ensure() fills
      // whatever is missing (fresh builds, bootstrapped tenants) and is a
      // no-op otherwise.
      DocSidecar.ensure(spark, dir)
      t -> (SegmentIndex.readMeta(dir).n - before)
    }.toMap
  }
}
