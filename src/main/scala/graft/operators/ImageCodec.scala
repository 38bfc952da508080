package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real (pure-JVM) image decode for the multimodal tier — no native codecs
  * required: `javax.imageio` ships with the JDK and decodes PNG/JPEG/GIF/BMP
  * headless.
  *
  * Two tiers, mirroring what a 100 TB media pipeline does:
  *  - `parseHeader`: byte-level sniff of format + dimensions WITHOUT decoding
  *    pixel data — the cheap metadata pass you run over everything;
  *  - `decode` + `luminanceFeature`: full pixel decode and a grid
  *    mean-luminance embedding — the expensive pass you run after filtering.
  * Both are pure functions of the payload bytes: safe inside `mapPartitions`
  * with no shared state.
  *
  * EMBEDDER NOTE — process-global side effect: loading this object calls
  * `ImageIO.setUseCache(false)`, which disables ImageIO's disk-backed
  * stream cache for EVERY ImageIO user sharing the executor/driver JVM,
  * including user UDFs decoding images large enough to benefit from the
  * temp-file cache. For this engine's in-memory `byte[]` payloads the
  * cache is pure per-image disk churn (it dominated small-image decode
  * cost — r16); an embedder that needs the cache back can call
  * `ImageIO.setUseCache(true)` after first touching this object, at the
  * price of re-paying the temp-file overhead in [[decode]]/[[parseHeader]].
  */
object ImageCodec {

  // ImageIO's default ImageInputStream cache writes a TEMP FILE per
  // decode — per-image disk churn that serves no purpose for in-memory
  // byte[] payloads and dominates small-image decode cost. Process-wide
  // and idempotent; set once when the codec loads in each executor JVM
  // (global effect documented in the object scaladoc above).
  ImageIO.setUseCache(false)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Sniff (format, width, height) from the header bytes alone. */
  def parseHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some(("png", be32(b, 16), be32(b, 20))) // IHDR is always the first chunk
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      Some(("gif", le16(b, 6), le16(b, 8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(("bmp", le32(b, 18), le32(b, 22)))
    else if (b.length >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
      // JPEG: walk segments to the first SOFn frame header. Legal streams may
      // pad with 0xFF fill bytes before a marker, and the RST0-7/SOI/EOI/TEM
      // markers are standalone (no 2-byte length field).
      var i = 2
      while (i + 1 < b.length) {
        if (b(i) != 0xff.toByte) return None
        while (i + 1 < b.length && b(i + 1) == 0xff.toByte) i += 1 // fill bytes
        if (i + 1 >= b.length) return None
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 9 >= b.length) return None
          return Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
        } else if ((marker >= 0xd0 && marker <= 0xd8) || marker == 0x01) {
          i += 2 // standalone marker
        } else if (marker == 0xd9) {
          return None // EOI before any frame header
        } else {
          if (i + 3 >= b.length) return None
          i += 2 + be16(b, i + 2)
        }
      }
      None
    } else None
  }

  /** Full pixel decode (ImageIO); None for undecodable payloads. */
  def decode(b: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(b)))
    catch { case _: Exception => None }

  /** grid x grid mean-luminance feature in [0, 1] (Rec. 601 weights),
    * row-major — a deterministic, resolution-independent image embedding. */
  def luminanceFeature(img: BufferedImage, grid: Int = 4): Array[Float] = {
    val out = new Array[Float](grid * grid)
    val counts = new Array[Int](grid * grid)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      val gy = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * grid / w, grid - 1)
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        val cell = gy * grid + gx
        out(cell) += lum.toFloat
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < out.length) { if (counts(i) > 0) out(i) /= counts(i); i += 1 }
    out
  }

  /** Deterministic synthetic PNG (pixels are a pure function of (seed, x, y))
    * — the test/bench image generator; encode is the same ImageIO path a real
    * ingest would exercise. */
  def synthPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var h = seed * 1000003L + y * 1009L + x
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
