package graft.app

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import graft.index.SegmentIndex

/** Backup / disaster-recovery tooling — the reference roadmap's operational
  * row ("SLAs, backups, disaster recovery",
  * /root/reference/COMMERCIAL_ROADMAP.md:69).
  *
  *   SnapshotJob snapshot <indexDir> <snapDir>   consistent point-in-time copy
  *   SnapshotJob verify   <snapDir>              re-hash every file
  *   SnapshotJob restore  <snapDir> <indexDir>   verified copy to a FRESH dir
  *
  * Why this is safe without locking the index: append-path mutations
  * (addDocuments / streaming ingest; compact writes to a NEW dir) never
  * touch committed files — they create bucket files AT OR ABOVE the
  * committed `Meta.buckets` and commit by rewriting index_meta.json (the
  * commit point). So `snapshot` (a) reads the meta BYTES first, pinning a
  * generation, (b) copies only the files that generation references
  * (segment/manifest/sidecar buckets outside the pinned meta's LIVE set
  * are an uncommitted in-flight add or dead droppings; the snapshot's
  * meta is the HELD bytes, not a re-read), and (c) re-reads meta after
  * the copy — if a mutation committed mid-copy the bytes differ and the
  * attempt is voided and retried (bounded), so a torn copy can never
  * verify clean. One mutation DOES delete committed files: a partial
  * compaction's post-commit sweep — a pinned file vanishing mid-copy
  * (NoSuchFileException) is therefore treated exactly like the stability
  * check firing: void the attempt and retry against the new generation. Orphan
  * docstore part-files from an in-flight add may ride along by name, but
  * are inert: their doc_ids lie beyond the held meta's `n` (no committed
  * segment can hit them) and the next addDocuments' orphan sweep deletes
  * them. NOT covered: a concurrent full `build` into the same live dir,
  * which rewrites committed files in place — don't do that to a dir being
  * snapshotted (rebuild to a fresh dir and /reload, the serving model).
  *
  * Integrity is end-to-end: each segment file is stream-hashed DURING the
  * copy and checked against its manifest's recorded sha256 (catching bit
  * rot at snapshot time, not restore time); every copied file's sha256 is
  * recorded in `snapshot_manifest.json`, and `verify`/`restore` re-hash
  * everything against it. The snapshot directory is written under a `.tmp`
  * name and renamed only after every hash checks out — a killed snapshot
  * never masquerades as a good one. Restore targets a fresh directory; the
  * live swap is the serving tier's own hot /reload.
  */
object SnapshotJob {
  private val Usage =
    "usage: SnapshotJob snapshot <indexDir> <snapDir> | verify <snapDir> | restore <snapDir> <indexDir>"

  private def usageErr(msg: String): Int = {
    System.err.println(s"SnapshotJob: $msg")
    System.err.println(Usage)
    2
  }
  private def runtimeErr(msg: String): Int = { System.err.println(s"SnapshotJob: $msg"); 3 }

  import org.json4s._
  import org.json4s.jackson.{JsonMethods, Serialization}
  private implicit val fmts: Formats = DefaultFormats

  /** relative path -> sha256 of every file in the snapshot. */
  private final case class SnapManifest(files: Map[String, String])
  private val ManifestName = "snapshot_manifest.json"

  /** Copy `src` to `dst` while hashing; returns the sha256 hex. */
  private def copySha(src: Path, dst: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new BufferedInputStream(Files.newInputStream(src))
    val out = new BufferedOutputStream(Files.newOutputStream(dst))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) { md.update(buf, 0, n); out.write(buf, 0, n) }
        n = in.read(buf)
      }
    } finally { in.close(); out.close() }
    md.digest().map("%02x".format(_)).mkString
  }

  private def fileSha(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new BufferedInputStream(Files.newInputStream(p))
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Files named with a per-bucket number — committed iff bucket < the held
    * meta's bucket count (an in-flight add creates only higher buckets).
    */
  private val BucketFile = "(?:segment-(\\d+)\\.bin|manifest-(\\d+)\\.json|docs-(\\d+)\\.bin)".r

  /** Every file a snapshot must carry, RELATIVE to the index dir: manifests,
    * segments, doc sidecars (LIVE buckets only — bucket >= meta.buckets is
    * an uncommitted in-flight add, and a bucket dropped by a partial
    * compaction is dead awaiting sweep), the docstore parquet tree, and (if
    * present) the API key file. index_meta.json is EXCLUDED — the snapshot
    * writes the bytes held from the generation pin, never a re-read.
    * `_staging` and tmp droppings are excluded.
    */
  private def indexFiles(indexDir: Path, live: Int => Boolean): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(indexDir)
    try s.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot { p =>
        val rel = indexDir.relativize(p).toString
        val uncommitted = rel match {
          case BucketFile(b1, b2, b3) =>
            Seq(b1, b2, b3).find(_ != null).exists(b => !live(b.toInt))
          case _ => false
        }
        rel.startsWith("_staging/") || rel.endsWith(".tmp") || rel == ManifestName ||
          rel == "index_meta.json" || uncommitted
      }
      .toSeq.sortBy(indexDir.relativize(_).toString)
    finally s.close()
  }

  /** Listing used by `verify`/`restore` over a SNAPSHOT dir (already a
    * single committed generation — no bucket filtering, meta included).
    */
  private def snapFiles(snapDir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(snapDir)
    try s.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot(p => snapDir.relativize(p).toString == ManifestName)
      .toSeq.sortBy(snapDir.relativize(_).toString)
    finally s.close()
  }

  private val SnapshotAttempts = 3

  def snapshot(indexDirS: String, snapDirS: String): Int = {
    val indexDir = Paths.get(indexDirS)
    val metaPath = indexDir.resolve("index_meta.json")
    if (!Files.exists(metaPath))
      return runtimeErr(s"not an index (no index_meta.json): $indexDirS")
    val snapDir = Paths.get(snapDirS)
    if (Files.exists(snapDir)) return runtimeErr(s"snapshot target already exists: $snapDirS")
    var attempt = 1
    while (true) {
      // pin the committed generation FIRST (meta is the commit point): hold
      // its exact bytes, and derive the committed bucket count from them
      val metaBytes = Files.readAllBytes(metaPath)
      val live = SegmentIndex.liveBucketSet(SegmentIndex.readMeta(indexDirS))
      // collect the manifest shas the copy will be checked against
      val manifests = SegmentIndex.segmentFiles(indexDirS).flatMap { f =>
        val b = f.replaceAll(".*segment-(\\d+)\\.bin$", "$1").toInt
        if (!live(b)) None
        else SegmentIndex.readManifest(indexDirS, b).map(m => f -> m)
      }.toMap
      val tmp = snapDir.resolveSibling(snapDir.getFileName.toString + ".tmp")
      try {
        Files.createDirectories(tmp)
        val hashes = indexFiles(indexDir, live).map { src =>
          val rel = indexDir.relativize(src).toString
          val dst = tmp.resolve(rel)
          Files.createDirectories(dst.getParent)
          val sha = copySha(src, dst)
          // segments are verified against their manifest's recorded sha AS
          // they stream through — bit rot is caught at snapshot time
          manifests.get(src.toString).foreach { m =>
            if (m.fileSha256 != sha)
              throw new IllegalStateException(
                s"segment $rel sha mismatch vs manifest (on-disk corruption): $sha != ${m.fileSha256}")
          }
          rel -> sha
        }.toMap
        // the snapshot's meta is the HELD generation pin, not a re-read
        Files.write(tmp.resolve("index_meta.json"), metaBytes)
        val metaSha = {
          val md = MessageDigest.getInstance("SHA-256")
          md.update(metaBytes)
          md.digest().map("%02x".format(_)).mkString
        }
        // stability check: if a mutation COMMITTED during the copy window,
        // meta changed and this attempt's listing may be torn — void it
        if (!java.util.Arrays.equals(Files.readAllBytes(metaPath), metaBytes)) {
          deleteRecursively(tmp)
          if (attempt >= SnapshotAttempts)
            return runtimeErr(
              s"index mutated during every snapshot attempt ($SnapshotAttempts tries) — quiesce ingest or retry")
          System.err.println(s"SnapshotJob: index mutated during copy (attempt $attempt) — retrying")
          attempt += 1
        } else {
          val all = hashes + ("index_meta.json" -> metaSha)
          Files.writeString(tmp.resolve(ManifestName), Serialization.write(SnapManifest(all)))
          Files.move(tmp, snapDir, StandardCopyOption.ATOMIC_MOVE)
          println(s"Snapshot completed: files=${all.size} out=$snapDirS")
          return 0
        }
      } catch {
        case e: java.nio.file.NoSuchFileException =>
          // a concurrent partial compaction committed and swept a file this
          // attempt had pinned — same situation as the meta stability check
          // firing, handled the same way: void the attempt and retry
          deleteRecursively(tmp)
          if (attempt >= SnapshotAttempts)
            return runtimeErr(
              s"index mutated during every snapshot attempt ($SnapshotAttempts tries) — quiesce maintenance or retry")
          System.err.println(s"SnapshotJob: pinned file vanished mid-copy (${e.getFile}; attempt $attempt) — retrying")
          attempt += 1
        case e: Exception =>
          // a failed snapshot never leaves a directory that looks complete
          deleteRecursively(tmp)
          return runtimeErr(s"snapshot failed: ${e.getMessage}")
      }
    }
    0 // unreachable
  }

  /** Re-hash every file against the snapshot manifest. Also fails on files
    * MISSING from disk or EXTRA unmanifested files (a tampered snapshot).
    */
  def verify(snapDirS: String): Int = {
    val snapDir = Paths.get(snapDirS)
    val mPath = snapDir.resolve(ManifestName)
    if (!Files.exists(mPath)) return runtimeErr(s"not a snapshot (no $ManifestName): $snapDirS")
    val manifest = JsonMethods.parse(Files.readString(mPath)).extract[SnapManifest]
    val onDisk = snapFiles(snapDir).map(p => snapDir.relativize(p).toString).toSet
    val missing = manifest.files.keySet -- onDisk
    if (missing.nonEmpty) return runtimeErr(s"snapshot missing file(s): ${missing.toSeq.sorted.mkString(", ")}")
    val extra = onDisk -- manifest.files.keySet
    if (extra.nonEmpty) return runtimeErr(s"unmanifested file(s) in snapshot: ${extra.toSeq.sorted.mkString(", ")}")
    val bad = manifest.files.toSeq.sortBy(_._1).collectFirst {
      case (rel, sha) if fileSha(snapDir.resolve(rel)) != sha => rel
    }
    bad match {
      case Some(rel) => runtimeErr(s"snapshot corrupt: sha mismatch on $rel")
      case None =>
        println(s"Snapshot verified: files=${manifest.files.size} ok=$snapDirS")
        0
    }
  }

  /** Verified restore into a FRESH directory (atomic: .tmp + rename). */
  def restore(snapDirS: String, indexDirS: String): Int = {
    val target = Paths.get(indexDirS)
    if (Files.exists(target)) return runtimeErr(s"restore target already exists: $indexDirS")
    val vc = verify(snapDirS)
    if (vc != 0) return vc
    val snapDir = Paths.get(snapDirS)
    val manifest = JsonMethods.parse(Files.readString(snapDir.resolve(ManifestName)))
      .extract[SnapManifest]
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    try {
      Files.createDirectories(tmp)
      manifest.files.toSeq.sortBy(_._1).foreach { case (rel, sha) =>
        val dst = tmp.resolve(rel)
        Files.createDirectories(dst.getParent)
        val got = copySha(snapDir.resolve(rel), dst)
        if (got != sha)
          throw new IllegalStateException(s"sha changed during restore copy: $rel")
      }
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      println(s"Restore completed: files=${manifest.files.size} out=$indexDirS")
      0
    } catch {
      case e: Exception =>
        deleteRecursively(tmp)
        runtimeErr(s"restore failed: ${e.getMessage}")
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val s = Files.walk(p)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.sortBy(-_.getNameCount).foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    }
  }

  /** Exit-2 argument layer (CliSpec-testable), then dispatch. */
  def run(args: Array[String]): Int = {
    if (args.contains("--help")) { println(Usage); return 0 } // reference: usage on stdout, exit 0
    val flags = args.filter(_.startsWith("--"))
    if (flags.nonEmpty) return usageErr(s"unknown flag: ${flags.head}")
    args.toSeq match {
      case Seq("snapshot", idx, snap) => snapshot(idx, snap)
      case Seq("verify", snap) => verify(snap)
      case Seq("restore", snap, idx) => restore(snap, idx)
      case Seq() => usageErr("missing command")
      case Seq(cmd, _*) if !Set("snapshot", "verify", "restore").contains(cmd) =>
        usageErr(s"unknown command: $cmd")
      case other => usageErr(s"wrong arity for '${other.head}'")
    }
  }

  def main(args: Array[String]): Unit = {
    val code = run(args)
    if (code != 0) sys.exit(code)
  }
}
