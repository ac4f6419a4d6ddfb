package graft.app

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkTestBase
import graft.index.{DocSidecar, SegmentIndex}
import graft.search.SegmentSearch

/** Backup/restore spec: snapshots are consistent and self-verifying
  * (every file sha-recorded; segments checked against their index
  * manifests during the copy), corruption of any byte is detected, and a
  * verified restore serves identical results.
  */
class SnapshotSpec extends SparkTestBase {

  private def buildIndex(): String = {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "alpha bravo charlie delta", "s1", "en"),
      (2L, "bravo charlie delta echo", "s1", "en"),
      (3L, "charlie delta echo foxtrot", "s2", "de"),
      (4L, "delta echo foxtrot golf", "s2", "fr")
    ).toDF("doc_id", "text", "source", "lang")
    val dir = Files.createTempDirectory("graft-snap-idx").toString
    SegmentIndex.build(docs, dir, buckets = 2)
    DocSidecar.ensure(spark, dir)
    dir
  }

  private def tmpName(): String = {
    val p = Files.createTempDirectory("graft-snap")
    Files.delete(p) // SnapshotJob wants a non-existent target
    p.toString
  }

  test("snapshot -> verify -> restore round-trips; every corruption class detected") {
    val idx = buildIndex()
    val baseline = SegmentSearch.searchBatch(spark, idx, Seq("charlie delta"), 10)(0)
    assert(baseline.nonEmpty)

    // snapshot + verify green; existing target refused
    val snapA = tmpName()
    assert(SnapshotJob.run(Array("snapshot", idx, snapA)) == 0)
    assert(SnapshotJob.run(Array("snapshot", idx, snapA)) == 3)
    assert(SnapshotJob.run(Array("verify", snapA)) == 0)

    // restore into a fresh dir serves IDENTICAL results
    val restored = tmpName()
    assert(SnapshotJob.run(Array("restore", snapA, restored)) == 0)
    val after = SegmentSearch.searchBatch(spark, restored, Seq("charlie delta"), 10)(0)
    assert(after == baseline, s"restored=$after baseline=$baseline")
    assert(SnapshotJob.run(Array("restore", snapA, restored)) == 3) // target exists

    // corruption class 1: a flipped byte in a segment file
    val seg = SegmentIndex.segmentFiles(snapA).head
    val ch = Files.newByteChannel(Paths.get(seg), StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      val buf = java.nio.ByteBuffer.allocate(1)
      ch.position(16); ch.read(buf)
      buf.flip(); buf.put(0, (buf.get(0) ^ 0x01).toByte)
      ch.position(16); ch.write(buf)
    } finally ch.close()
    assert(SnapshotJob.run(Array("verify", snapA)) == 3)
    assert(SnapshotJob.run(Array("restore", snapA, tmpName())) == 3) // refuses corrupt source

    // corruption class 2 and 3 on a clean snapshot: missing + unmanifested file
    val snapB = tmpName()
    assert(SnapshotJob.run(Array("snapshot", idx, snapB)) == 0)
    Files.delete(Paths.get(snapB, "index_meta.json"))
    assert(SnapshotJob.run(Array("verify", snapB)) == 3)
    val snapC = tmpName()
    assert(SnapshotJob.run(Array("snapshot", idx, snapC)) == 0)
    Files.writeString(Paths.get(snapC, "smuggled.bin"), "x")
    assert(SnapshotJob.run(Array("verify", snapC)) == 3)

    // corruption class 4: rot in the LIVE index is caught AT SNAPSHOT TIME
    // (segment stream-hash vs its manifest)
    val liveSeg = SegmentIndex.segmentFiles(idx).head
    val ch2 = Files.newByteChannel(Paths.get(liveSeg), StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      val buf = java.nio.ByteBuffer.allocate(1)
      ch2.position(20); ch2.read(buf)
      buf.flip(); buf.put(0, (buf.get(0) ^ 0x01).toByte)
      ch2.position(20); ch2.write(buf)
    } finally ch2.close()
    val snapBad = tmpName()
    assert(SnapshotJob.run(Array("snapshot", idx, snapBad)) == 3)
    assert(!Files.exists(Paths.get(snapBad)), "failed snapshot must not leave a target dir")
  }

  test("snapshot pins the committed generation: in-flight add files (bucket >= meta.buckets) are excluded") {
    val idx = buildIndex() // buckets = 2 -> committed files are 00000/00001
    val baseline = SegmentSearch.searchBatch(spark, idx, Seq("charlie delta"), 10)(0)
    // simulate an in-flight addDocuments that has renamed its new bucket
    // files in but NOT yet committed meta: bucket 2 exists on disk only
    Files.write(Paths.get(idx, "segment-00002.bin"), Array[Byte](1, 2, 3))
    Files.writeString(Paths.get(idx, "manifest-00002.json"), "{}")
    Files.write(Paths.get(idx, "docs-00002.bin"), Array[Byte](9))
    val snap = tmpName()
    assert(SnapshotJob.run(Array("snapshot", idx, snap)) == 0)
    assert(!Files.exists(Paths.get(snap, "segment-00002.bin")), "uncommitted segment must not be snapshotted")
    assert(!Files.exists(Paths.get(snap, "manifest-00002.json")), "uncommitted manifest must not be snapshotted")
    assert(!Files.exists(Paths.get(snap, "docs-00002.bin")), "uncommitted sidecar must not be snapshotted")
    // the snapshot's meta is byte-identical to the pinned generation
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(snap, "index_meta.json")),
      Files.readAllBytes(Paths.get(idx, "index_meta.json"))))
    assert(SnapshotJob.run(Array("verify", snap)) == 0)
    // and the restored index ignores nothing it needs: identical results
    val restored = tmpName()
    assert(SnapshotJob.run(Array("restore", snap, restored)) == 0)
    val b = SegmentSearch.searchBatch(spark, restored, Seq("charlie delta"), 10)(0)
    assert(b == baseline)
  }

  test("SnapshotJob: argument matrix (exit 2 before any work)") {
    assert(SnapshotJob.run(Array.empty) == 2)
    assert(SnapshotJob.run(Array("frobnicate", "a")) == 2)
    assert(SnapshotJob.run(Array("snapshot", "onlyOne")) == 2)
    assert(SnapshotJob.run(Array("verify")) == 2)
    assert(SnapshotJob.run(Array("restore", "a")) == 2)
    assert(SnapshotJob.run(Array("--flag", "verify", "a")) == 2)
    assert(SnapshotJob.run(Array("snapshot", "/nonexistent-idx", tmpName())) == 3)
    assert(SnapshotJob.run(Array("verify", tmpName())) == 3)
  }
}
