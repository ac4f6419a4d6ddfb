package graft.pipeline

import java.io.ByteArrayInputStream

import graft.SparkTestBase

/** Real WAV (RIFF) header decode — the audio twin of [[ImageHeadersSpec]]:
  * round-trips through our RIFF walker AND the JDK's own
  * `javax.sound.sampled` reader (an independent WAV implementation), plus
  * the chunk-walk edges (padding, extra chunks) and the rejection boundary
  * to the labeled stub.
  */
class AudioHeadersSpec extends SparkTestBase {

  private def jdkWav(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
    val f = aff.getFormat
    (f.getChannels, f.getSampleRate.toInt, f.getSampleSizeInBits, aff.getFrameLength.toLong)
  }

  test("synthetic WAVs round-trip our parser and agree with the JDK reader") {
    val cases = Seq(
      (1, 8000, 8, 0L),
      (1, 8000, 8, 1L),
      (2, 16000, 16, 5L),
      (1, 44100, 16, 1000L),
      (2, 48000, 8, 999L),
      (2, 44100, 16, 12345L)
    )
    cases.foreach { case (ch, rate, bits, n) =>
      val wav = AudioHeaders.synthWav(ch, rate, bits, n)
      val got = AudioHeaders.parseWav(wav)
      assert(got.contains(AudioHeaders.WavMeta(ch, rate, bits, n, n * 1000000L / rate)),
        s"ch=$ch rate=$rate bits=$bits n=$n got=$got")
      assert(jdkWav(wav) == ((ch, rate, bits, n)), s"JDK disagrees for ch=$ch rate=$rate bits=$bits n=$n")
    }
  }

  test("chunk walk: extra odd-sized chunk before fmt is skipped with RIFF even-padding") {
    val base = AudioHeaders.synthWav(2, 16000, 16, 7L)
    // splice a 3-byte "LIST" chunk (odd size -> 1 pad byte) right after "WAVE"
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // fix the RIFF size field (u32le at offset 4)
    val riffSize = (spliced.length - 8).toLong
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    assert(AudioHeaders.parseWav(spliced).contains(
      AudioHeaders.WavMeta(2, 16000, 16, 7L, 7L * 1000000L / 16000L)))
  }

  test("rejection boundary: non-WAV bytes fall back, malformed WAVs never throw") {
    assert(AudioHeaders.parseWav("plain utf-8 text, definitely not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioHeaders.parseWav(Array.emptyByteArray).isEmpty)
    assert(AudioHeaders.parseWav(ImageHeaders.synthPng(4, 4)).isEmpty)
    val good = AudioHeaders.synthWav(1, 8000, 16, 10L)
    assert(AudioHeaders.parseWav(good.dropRight(good.length - 30)).isEmpty) // truncated mid-fmt
    // "RIFF" + "WAVE" but a chunk whose declared size runs past the buffer
    val overrun = good.clone()
    overrun(16) = 0x7f // fmt chunk size low byte -> enormous
    assert(AudioHeaders.parseWav(overrun).isEmpty)
    // data chunk present but fmt missing
    val noFmt = good.take(12) ++ good.drop(36) // strip the fmt chunk
    assert(AudioHeaders.parseWav(noFmt).isEmpty)
    // zero blockAlign must not divide-by-zero
    val zeroAlign = good.clone()
    zeroAlign(32) = 0; zeroAlign(33) = 0
    assert(AudioHeaders.parseWav(zeroAlign).isEmpty)
    // compressed formats (ADPCM 0x11, MP3 0x55): blockAlign is the
    // compressed block size, so dataSize/blockAlign would be a silently
    // wrong frame count — must fall back to the stub, not mis-decode
    Seq(0x11, 0x55).foreach { fmt =>
      val comp = good.clone()
      comp(20) = (fmt & 0xff).toByte; comp(21) = 0
      assert(AudioHeaders.parseWav(comp).isEmpty, s"audioFormat 0x${fmt.toHexString}")
    }
    // IEEE float (3) and extensible (0xFFFE) are PCM-family: accepted
    Seq(3, 0xfffe).foreach { fmt =>
      val ok = good.clone()
      ok(20) = (fmt & 0xff).toByte; ok(21) = ((fmt >> 8) & 0xff).toByte
      assert(AudioHeaders.parseWav(ok).nonEmpty, s"audioFormat 0x${fmt.toHexString}")
    }
  }

  test("audioHeaderMeta: closed-form metadata from real synthesized RIFF bytes") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = Multimodal.audioHeaderMeta(docs).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val id = r.getLong(0)
      val rate = Seq(8000L, 16000L, 44100L, 48000L)((id % 4L).toInt)
      val n = 1L + id % 1000L
      assert(r.getString(1) == "wav")
      assert(r.getLong(2) == 1L + id % 2L, s"channels for $id")
      assert(r.getLong(3) == rate, s"rate for $id")
      assert(r.getLong(4) == (if (id % 3L == 0L) 8L else 16L), s"bits for $id")
      assert(r.getLong(5) == n && r.getLong(6) == n * 1000000L / rate, s"duration for $id")
    }
  }
}
