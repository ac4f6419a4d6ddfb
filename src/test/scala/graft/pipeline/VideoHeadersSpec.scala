package graft.pipeline

import graft.SparkTestBase

/** Real MP4 (ISO-BMFF) header decode — the video twin of
  * [[ImageHeadersSpec]]/[[AudioHeadersSpec]]. The JDK ships no MP4 reader
  * to cross-check against (unlike ImageIO / javax.sound.sampled), so the
  * spec pins the ISO 14496-12 byte layout directly: hand-assembled boxes
  * (v1 mvhd, 64-bit largesize, to-EOF size 0, unknown-box skipping) beside
  * the synthMp4 round trip, plus the rejection boundary to the stub.
  */
class VideoHeadersSpec extends SparkTestBase {

  private def w32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def w64(v: Long): Array[Byte] = w32(v >>> 32) ++ w32(v & 0xffffffffL)
  private def tag(t: String): Array[Byte] = t.getBytes("US-ASCII")

  test("synthetic MP4s round-trip the box walker") {
    val cases = Seq((600L, 0L), (600L, 1L), (1000L, 12345L), (90000L, 99999L),
      (48000L, 100000L), (1L, 0xffffffffL), (0xffffffffL, 1L))
    cases.foreach { case (ts, dur) =>
      val mp4 = VideoHeaders.synthMp4(ts, dur)
      assert(VideoHeaders.parseMp4(mp4).contains(
        VideoHeaders.Mp4Meta("isom", ts, dur, dur * 1000000L / ts)), s"ts=$ts dur=$dur")
    }
  }

  test("box walk: unknown boxes skip, largesize and to-EOF sizes parse, v1 mvhd widens") {
    val base = VideoHeaders.synthMp4(1000L, 77L)
    val ftyp = base.take(20)
    val moov = base.drop(20)
    // a 'free' box between ftyp and moov is skipped
    val free = w32(12L) ++ tag("free") ++ Array[Byte](1, 2, 3, 4)
    assert(VideoHeaders.parseMp4(ftyp ++ free ++ moov).contains(
      VideoHeaders.Mp4Meta("isom", 1000L, 77L, 77000L)))
    // moov as a largesize (size==1 + u64) box
    val moovLarge = w32(1L) ++ tag("moov") ++ w64(16L + (moov.length - 8)) ++ moov.drop(8)
    assert(VideoHeaders.parseMp4(ftyp ++ moovLarge).contains(
      VideoHeaders.Mp4Meta("isom", 1000L, 77L, 77000L)))
    // moov with size 0 (extends to EOF)
    val moovEof = w32(0L) ++ moov.drop(4)
    assert(VideoHeaders.parseMp4(ftyp ++ moovEof).contains(
      VideoHeaders.Mp4Meta("isom", 1000L, 77L, 77000L)))
    // version-1 mvhd: u64 creation/modification/duration, u32 timescale
    val bigDur = 0x123456789AL // needs 64 bits
    val mvhd1 = {
      val body = w32(0x01000000L) ++ // version 1 + flags
        w64(0L) ++ w64(0L) ++ // creation, modification
        w32(90000L) ++ w64(bigDur) ++
        w32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ w64(0L) ++
        (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).flatMap(w32(_)).toArray: Array[Byte]) ++
        Array.fill(24)(0.toByte) ++ w32(2L)
      w32(8L + body.length) ++ tag("mvhd") ++ body
    }
    val moov1 = w32(8L + mvhd1.length) ++ tag("moov") ++ mvhd1
    assert(VideoHeaders.parseMp4(ftyp ++ moov1).contains(
      VideoHeaders.Mp4Meta("isom", 90000L, bigDur, bigDur * 1000000L / 90000L)))
  }

  test("rejection boundary: non-MP4 bytes fall back, malformed boxes never throw") {
    assert(VideoHeaders.parseMp4("plain utf-8 text, definitely not video".getBytes("UTF-8")).isEmpty)
    assert(VideoHeaders.parseMp4(Array.emptyByteArray).isEmpty)
    assert(VideoHeaders.parseMp4(ImageHeaders.synthPng(4, 4)).isEmpty)
    assert(VideoHeaders.parseMp4(AudioHeaders.synthWav(1, 8000, 16, 4L)).isEmpty)
    val good = VideoHeaders.synthMp4(1000L, 77L)
    assert(VideoHeaders.parseMp4(good.take(30)).isEmpty) // truncated mid-moov
    // moov without an mvhd child
    val ftyp = good.take(20)
    val emptyMoov = w32(16L) ++ tag("moov") ++ w32(8L) ++ tag("udta")
    assert(VideoHeaders.parseMp4(ftyp ++ emptyMoov).isEmpty)
    // zero timescale
    val zeroTs = good.clone()
    // mvhd payload starts at 20 (ftyp) + 8 (moov hdr) + 8 (mvhd hdr) = 36;
    // timescale is at +12 past version/creation/modification
    (0 until 4).foreach(k => zeroTs(36 + 12 + k) = 0)
    assert(VideoHeaders.parseMp4(zeroTs).isEmpty)
    // a box whose declared size overruns the buffer
    val overrun = good.clone()
    overrun(20) = 0x7f // moov size high byte -> enormous
    assert(VideoHeaders.parseMp4(overrun).isEmpty)
    // a SHORT mvhd (cs=8, empty payload) must not read its sibling box's
    // bytes as timescale/duration — bounds are the mvhd box's own end
    val shortMvhd = w32(8L) ++ tag("mvhd")
    val sibling = w32(40L) ++ tag("udta") ++ Array.fill(32)(7.toByte)
    val moovShort = w32((8 + shortMvhd.length + sibling.length).toLong) ++ tag("moov") ++ shortMvhd ++ sibling
    assert(VideoHeaders.parseMp4(ftyp ++ moovShort).isEmpty)
    // v1 duration whose micros overflow Long: rejected, not wrapped negative
    val hugeDur = Long.MaxValue / 1000000L + 1L
    val mvhdHuge = {
      val body = w32(0x01000000L) ++ w64(0L) ++ w64(0L) ++ w32(90000L) ++ w64(hugeDur) ++
        Array.fill(80)(0.toByte)
      w32(8L + body.length) ++ tag("mvhd") ++ body
    }
    val moovHuge = w32(8L + mvhdHuge.length) ++ tag("moov") ++ mvhdHuge
    assert(VideoHeaders.parseMp4(ftyp ++ moovHuge).isEmpty)
  }

  test("videoHeaderMeta: closed-form metadata from real synthesized ISO-BMFF bytes") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = Multimodal.videoHeaderMeta(docs).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val id = r.getLong(0)
      val ts = Seq(600L, 1000L, 90000L, 48000L)((id % 4L).toInt)
      val ticks = 1L + id % 100000L
      assert(r.getString(1) == "mp4")
      assert(r.getLong(2) == ts && r.getLong(3) == ticks, s"params for $id")
      assert(r.getLong(4) == ticks * 1000000L / ts, s"duration for $id")
    }
  }
}
