package graft.pipeline

import java.io.ByteArrayInputStream

import graft.SparkTestBase

/** Real PNG/JPEG header decode: round-trips through our parser AND the
  * JDK's own ImageIO header readers (an independent implementation of both
  * formats — dims are read from the header without decoding pixels), plus
  * the fallback boundary to the labeled stub.
  */
class ImageHeadersSpec extends SparkTestBase {

  private def imageIoDims(bytes: Array[Byte]): (Int, Int) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, "JDK ImageIO found no reader for the synthetic blob")
      val r = readers.next()
      r.setInput(iis)
      try (r.getWidth(0), r.getHeight(0))
      finally r.dispose()
    } finally iis.close()
  }

  test("synthetic PNG/JPEG round-trip our parser and agree with JDK ImageIO") {
    // 65500 is libjpeg's hard dimension cap (the JDK reader refuses above)
    val dims = Seq((1, 1), (7, 3), (640, 480), (65500, 1), (1, 65500), (320, 240))
    dims.foreach { case (w, h) =>
      val png = ImageHeaders.synthPng(w, h)
      assert(ImageHeaders.parse(png).contains(ImageHeaders.Dims("png", w, h)), s"png ${w}x$h")
      assert(imageIoDims(png) == ((w, h)), s"ImageIO png ${w}x$h")
      val jpg = ImageHeaders.synthJpeg(w, h)
      assert(ImageHeaders.parse(jpg).contains(ImageHeaders.Dims("jpeg", w, h)), s"jpeg ${w}x$h")
      assert(imageIoDims(jpg) == ((w, h)), s"ImageIO jpeg ${w}x$h")
    }
    // the format itself allows the full u16 range — our parser handles it
    val maxJpg = ImageHeaders.synthJpeg(65535, 65535)
    assert(ImageHeaders.parse(maxJpg).contains(ImageHeaders.Dims("jpeg", 65535, 65535)))
    // PNG can exceed u16 dims (u32 in IHDR); JPEG cannot
    val big = ImageHeaders.synthPng(70000, 3)
    assert(ImageHeaders.parse(big).contains(ImageHeaders.Dims("png", 70000, 3)))
    intercept[IllegalArgumentException](ImageHeaders.synthJpeg(70000, 3))
  }

  test("JPEG marker walk skips leading segments and fill bytes to reach SOFn") {
    val base = ImageHeaders.synthJpeg(123, 45)
    // splice an extra COM segment + a fill byte after SOI (offset 2)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x05, 'h', 'i', '!')
    val fill = Array[Byte](0xff.toByte) // fill byte before the next marker
    val spliced = base.take(2) ++ com ++ fill ++ base.drop(2)
    assert(ImageHeaders.parse(spliced).contains(ImageHeaders.Dims("jpeg", 123, 45)))
  }

  test("non-image bytes fall back to the labeled stub; truncation never throws") {
    val text = "alpha bravo charlie".getBytes("UTF-8")
    assert(ImageHeaders.parse(text).isEmpty)
    assert(Multimodal.decode(5L, text) == Multimodal.stubDecode(5L, text))
    // truncated real headers: parse refuses, decode falls back
    val png = ImageHeaders.synthPng(10, 10)
    val jpg = ImageHeaders.synthJpeg(10, 10)
    (1 until png.length).foreach(n => ImageHeaders.parse(png.take(n))) // must not throw
    (1 until jpg.length).foreach(n => ImageHeaders.parse(jpg.take(n)))
    assert(ImageHeaders.parse(png.take(20)).isEmpty)
    assert(ImageHeaders.parse(jpg.take(6)).isEmpty)
    // flipped magic byte
    val bad = png.clone(); bad(0) = 0x42
    assert(ImageHeaders.parse(bad).isEmpty)
    assert(ImageHeaders.parse(Array.emptyByteArray).isEmpty)
  }

  test("imageHeaderMeta: real bytes built and parsed row-locally match the closed form") {
    val docs = docsDF((1L to 50L).map(i => i -> s"text $i"))
    val rows = Multimodal.imageHeaderMeta(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.length == 50)
    rows.foreach { case (id, fmt, w, h) =>
      assert(fmt == (if (id % 2 == 0) "png" else "jpeg"))
      assert(w == 1 + id % 640 && h == 1 + id % 480, s"doc $id")
    }
    // extractMeta on text blobs still takes the stub path (UTF-8 text can
    // never carry a PNG/JPEG signature)
    val meta = Multimodal.extractMeta(docs).collect()
    meta.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val expect = Multimodal.stubDecode(id, s"text $id".getBytes("UTF-8"))
      assert(r.getLong(r.fieldIndex("width")) == expect.width, s"doc $id stub parity")
      assert(Set("img", "aud", "vid").contains(r.getString(r.fieldIndex("fmt"))))
    }
  }
}
