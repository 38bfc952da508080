package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageCodecSpec extends AnyFunSuite {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def rgbImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 7) * 1001)
    img
  }

  test("parseHeader reads dimensions from png/jpeg/gif/bmp bytes without decoding") {
    for ((fmt, w, h) <- Seq(("png", 33, 17), ("jpg", 40, 25), ("gif", 12, 9), ("bmp", 21, 5))) {
      val bytes = encode(rgbImage(w, h), fmt)
      val expected = if (fmt == "jpg") "jpeg" else fmt
      assert(ImageCodec.parseHeader(bytes).contains((expected, w, h)),
        s"$fmt header parse failed: ${ImageCodec.parseHeader(bytes)}")
    }
  }

  test("parseHeader rejects non-image bytes") {
    assert(ImageCodec.parseHeader("just some text".getBytes).isEmpty)
    assert(ImageCodec.parseHeader(Array[Byte](0x89.toByte, 1, 2)).isEmpty)
  }

  test("parseHeader JPEG walk survives fill bytes and standalone markers") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // SOI, TEM (standalone, no length), fill 0xFF, then SOF0 h=100 w=200
    val sof = bytes(0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x64, 0x00, 0xc8, 0x03)
    val j1 = bytes(0xff, 0xd8, 0xff, 0x01) ++ bytes(0xff) ++ sof
    assert(ImageCodec.parseHeader(j1).contains(("jpeg", 200, 100)))
    // RST markers (standalone) before the frame header
    val j2 = bytes(0xff, 0xd8, 0xff, 0xd0, 0xff, 0xd7) ++ sof
    assert(ImageCodec.parseHeader(j2).contains(("jpeg", 200, 100)))
    // EOI before any SOF → no dimensions
    val j3 = bytes(0xff, 0xd8, 0xff, 0xd9)
    assert(ImageCodec.parseHeader(j3).isEmpty)
    // truncated mid-segment → None, no exception
    val j4 = bytes(0xff, 0xd8, 0xff, 0xe0, 0x00)
    assert(ImageCodec.parseHeader(j4).isEmpty)
  }

  test("decode round-trips synthPng pixels deterministically") {
    val a = ImageCodec.synthPng(42L, 20, 10)
    val b = ImageCodec.synthPng(42L, 20, 10)
    assert(a.sameElements(b), "synthPng must be byte-deterministic")
    val img = ImageCodec.decode(a).get
    assert(img.getWidth == 20 && img.getHeight == 10)
    // PNG is lossless: a decoded pixel equals the generator's formula
    var hsh = 42L * 1000003L + 3L * 1009L + 5L
    hsh ^= hsh >>> 33; hsh *= 0xff51afd7ed558ccdL; hsh ^= hsh >>> 33
    assert((img.getRGB(5, 3) & 0xffffff) == (hsh & 0xffffff).toInt)
  }

  test("luminanceFeature is grid-shaped, bounded, and discriminates images") {
    val f1 = ImageCodec.luminanceFeature(ImageCodec.decode(ImageCodec.synthPng(1, 32, 32)).get, 4)
    val f2 = ImageCodec.luminanceFeature(ImageCodec.decode(ImageCodec.synthPng(2, 32, 32)).get, 4)
    assert(f1.length == 16 && f1.forall(v => v >= 0f && v <= 1f))
    assert(!f1.sameElements(f2))
    // all-black image → all-zero feature
    val black = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    assert(ImageCodec.luminanceFeature(black, 2).forall(_ == 0f))
  }
}
