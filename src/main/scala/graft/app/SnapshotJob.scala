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
  * Why this is safe without locking the index: segments are append-only and
  * every mutation (build / addDocuments / compact) commits by atomic rename
  * with the META REWRITE as the commit point — so a snapshot taken by
  * reading meta FIRST and then copying the files meta references sees a
  * consistent committed generation (a concurrent add only creates NEW
  * bucket files this snapshot never references).
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

  /** Every file a snapshot must carry, RELATIVE to the index dir: meta,
    * manifests, segments, doc sidecars, the docstore parquet tree, and (if
    * present) the API key file. `_staging` and tmp droppings are excluded.
    */
  private def indexFiles(indexDir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(indexDir)
    try s.iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot { p =>
        val rel = indexDir.relativize(p).toString
        rel.startsWith("_staging/") || rel.endsWith(".tmp") || rel == ManifestName
      }
      .toSeq.sortBy(indexDir.relativize(_).toString)
    finally s.close()
  }

  def snapshot(indexDirS: String, snapDirS: String): Int = {
    val indexDir = Paths.get(indexDirS)
    if (!Files.exists(indexDir.resolve("index_meta.json")))
      return runtimeErr(s"not an index (no index_meta.json): $indexDirS")
    val snapDir = Paths.get(snapDirS)
    if (Files.exists(snapDir)) return runtimeErr(s"snapshot target already exists: $snapDirS")
    // read the committed generation FIRST (meta is the commit point), then
    // collect the manifest shas the copy will be checked against
    val manifests = SegmentIndex.segmentFiles(indexDirS).flatMap { f =>
      val b = f.replaceAll(".*segment-(\\d+)\\.bin$", "$1").toInt
      SegmentIndex.readManifest(indexDirS, b).map(m => f -> m)
    }.toMap
    val tmp = snapDir.resolveSibling(snapDir.getFileName.toString + ".tmp")
    try {
      Files.createDirectories(tmp)
      val hashes = indexFiles(indexDir).map { src =>
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
      Files.writeString(tmp.resolve(ManifestName), Serialization.write(SnapManifest(hashes)))
      Files.move(tmp, snapDir, StandardCopyOption.ATOMIC_MOVE)
      println(s"Snapshot completed: files=${hashes.size} out=$snapDirS")
      0
    } catch {
      case e: Exception =>
        // a failed snapshot never leaves a directory that looks complete
        deleteRecursively(tmp)
        runtimeErr(s"snapshot failed: ${e.getMessage}")
    }
  }

  /** Re-hash every file against the snapshot manifest. Also fails on files
    * MISSING from disk or EXTRA unmanifested files (a tampered snapshot).
    */
  def verify(snapDirS: String): Int = {
    val snapDir = Paths.get(snapDirS)
    val mPath = snapDir.resolve(ManifestName)
    if (!Files.exists(mPath)) return runtimeErr(s"not a snapshot (no $ManifestName): $snapDirS")
    val manifest = JsonMethods.parse(Files.readString(mPath)).extract[SnapManifest]
    val onDisk = indexFiles(snapDir).map(p => snapDir.relativize(p).toString).toSet
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
