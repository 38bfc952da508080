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
