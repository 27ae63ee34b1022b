package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image decode/encode on the JDK's built-in `javax.imageio`
  * readers (PNG/JPEG/BMP/GIF/WBMP) — no external codec dependency.
  * This is the "image" leg of the multimodal path: encoded payload
  * bytes -> 8-bit grayscale grid -> box-filter resample -> perceptual
  * hash / feature vector / re-encoded thumbnail.
  *
  * Everything here is executor-side and allocation-bounded: one
  * decoded frame at a time, in-memory streams only
  * (`ImageIO.setUseCache(false)` — no executor tmp files), and
  * integer-only luma/averaging so results are bit-deterministic
  * across JVMs and platforms for lossless formats.
  */
object ImageCodec {

  // never spill decode scratch to disk on executors
  ImageIO.setUseCache(false)

  /** A decoded 8-bit grayscale image, row-major. */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  /** Decode encoded image bytes (any format the JDK readers handle)
    * to grayscale. Integer BT.601 luma `(77R + 150G + 29B) >> 8` keeps
    * the result deterministic. Returns None for null, empty, or
    * undecodable payloads — corrupt media is a data fact at 100 TB,
    * not an exception. */
  def decodeGray(content: Array[Byte]): Option[GrayImage] = {
    if (content == null || content.isEmpty) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Byte](w * h)
      val raster = img.getRaster
      if (raster.getNumBands == 1 && img.getColorModel.getComponentSize(0) == 8) {
        // already 8-bit gray: read raster samples raw — getRGB would
        // push them through a linear-gray->sRGB conversion and break
        // losslessness of the PNG round-trip
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = raster.getSample(x, y, 0).toByte
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            out(y * w + x) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
            x += 1
          }
          y += 1
        }
      }
      Some(GrayImage(w, h, out))
    }
  }

  /** Box-filter (area-average) resample of a grayscale grid. Each
    * destination cell averages its non-overlapping source box, so
    * downsampling integrates every pixel (no aliasing, unlike
    * nearest-neighbor) and a single-pixel edit perturbs exactly one
    * cell. Integer floor division keeps it deterministic. Reads past
    * a short `pixels` array count as 0 (declared dims may exceed the
    * payload for raw-grid fixtures). */
  def resampleGray(pixels: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    require(srcW > 0 && srcH > 0 && dstW > 0 && dstH > 0)
    val px = if (pixels == null) Array.emptyByteArray else pixels
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val y0 = y * srcH / dstH
      val y1 = math.max(y0 + 1, math.min((y + 1) * srcH / dstH, srcH))
      var x = 0
      while (x < dstW) {
        val x0 = x * srcW / dstW
        val x1 = math.max(x0 + 1, math.min((x + 1) * srcW / dstW, srcW))
        var sum = 0L
        var yy = y0
        while (yy < y1) {
          val row = yy * srcW
          var xx = x0
          while (xx < x1) {
            val idx = row + xx
            if (idx < px.length) sum += px(idx) & 0xFF
            xx += 1
          }
          yy += 1
        }
        out(y * dstW + x) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a grayscale grid as PNG (lossless — decode(encode(g)) == g),
    * so resized outputs are themselves valid media payloads. */
  def encodePng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length >= w * h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, java.util.Arrays.copyOf(pixels, w * h))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 16-bin L1-normalized histogram of decoded pixel values — the
    * real-pixel analog of [[Multimodal.decodeStub]]'s byte histogram. */
  def grayHistogram(g: GrayImage, dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    val n = g.pixels.length
    var i = 0
    while (i < n) {
      hist((g.pixels(i) & 0xFF) * dim / 256) += 1f
      i += 1
    }
    if (n > 0) {
      var j = 0
      while (j < dim) { hist(j) /= n.toFloat; j += 1 }
    }
    hist
  }
}
