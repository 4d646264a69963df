package graft.llm

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Real image decode for the multimodal kernels: PNG/JPEG payloads (sniffed
  * by magic bytes) decode through the JDK's javax.imageio; anything else
  * returns None and the caller falls back to its deterministic stub. Pure
  * per-row byte work — safe inside executor-side mapPartitions kernels.
  */
object ImageKernel {

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  def isImage(b: Array[Byte]): Boolean = isPng(b) || isJpeg(b)

  def decode(b: Array[Byte]): Option[BufferedImage] =
    if (!isImage(b)) None
    else Option(ImageIO.read(new ByteArrayInputStream(b)))

  /** (width, height) when the payload is a decodable image. */
  def dims(b: Array[Byte]): Option[(Long, Long)] =
    decode(b).map(i => (i.getWidth.toLong, i.getHeight.toLong))

  /** Integer-luminance histogram over all pixels: l = (299r+587g+114b)/1000,
    * bucket = l * buckets / 256. The real analog of the stub token-initial
    * histogram — fixed-length numeric features from a binary payload.
    */
  def lumaHistogram(img: BufferedImage, buckets: Int = 8): Array[Long] = {
    val hist = new Array[Long](buckets)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
        hist(l * buckets / 256) += 1
        x += 1
      }
      y += 1
    }
    hist
  }
}
