package graft.image

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.functions.TextHashing.splitmix64

/** Deterministic image synthesis + decode for the image+caption corpus
  * (north-rule `input_hint`: bytes binary, w, h, fmt ∈ {png,bmp,jpeg},
  * phash int64; per-row invariant: decoded pixels exact for lossless
  * formats, PSNR ≥ 40 dB for jpeg).
  *
  * Patterns are smooth low-frequency sinusoids (seeded), so jpeg survives
  * quantization with high PSNR; all generation/verification happens with the
  * same JDK ImageIO, keeping the invariant platform-stable (SURVEY §7.4.5).
  */
object ImageCodec {

  // ImageIO defaults to FILE-backed stream caches — every decode/encode
  // creates and deletes a temp file, which serializes on the filesystem when
  // 32 executor threads decode concurrently (measured: inverse scaling on
  // local[8]→local[32]). Memory caching removes the shared resource.
  javax.imageio.ImageIO.setUseCache(false)

  /** Seeded smooth RGB pattern. */
  def pattern(seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // Low spatial frequencies, seeded; all three channels share the spatial
    // structure (luma-dominant signal) so jpeg 4:2:0 chroma subsampling can't
    // eat the pattern — chroma is near-constant per image.
    def coef(i: Int): Double = 1.0 + (splitmix64(seed * 31 + i) & 0x3L).toDouble % 3.0
    def phase(i: Int): Double = (splitmix64(seed * 131 + i) & 0xffffL).toDouble / 65536.0 * 2 * math.Pi
    val (fx1, fy1, p1) = (coef(1), coef(2), phase(3))
    val (fx2, fy2, p2) = (coef(4), coef(5), phase(6))
    val tintR = 1.0
    val tintG = 0.85 + (splitmix64(seed + 17) & 0xfL).toDouble / 128.0
    val tintB = 0.75 + (splitmix64(seed + 23) & 0xfL).toDouble / 128.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 128.0 +
          60.0 * math.sin(2 * math.Pi * (fx1 * x / w.toDouble + fy1 * y / h.toDouble) + p1) +
          40.0 * math.sin(2 * math.Pi * (fx2 * x / w.toDouble + fy2 * y / h.toDouble) + p2)
        def ch(t: Double): Int = math.max(0, math.min(255, (base * t).round.toInt))
        img.setRGB(x, y, (ch(tintR) << 16) | (ch(tintG) << 8) | ch(tintB))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode with an explicit jpeg quality (0.95) so the lossy invariant holds. */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fmt match {
      case "jpeg" | "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(0.98f)
        val ios = new MemoryCacheImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.flush()
        writer.dispose()
      case f =>
        ImageIO.write(img, f, out)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  def generate(seed: Long, w: Int, h: Int, fmt: String): Array[Byte] =
    encode(pattern(seed, w, h), fmt)

  /** Peak signal-to-noise ratio between two same-size RGB images (dB);
    * Double.PositiveInfinity when identical. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    var se = 0.0
    var n = 0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y)
        val pb = b.getRGB(x, y)
        var s = 16
        while (s >= 0) {
          val d = ((pa >> s) & 0xff) - ((pb >> s) & 0xff)
          se += d.toDouble * d
          n += 1
          s -= 8
        }
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * n / se)
  }

  // --- perceptual hash -------------------------------------------------------

  /** 64-bit perceptual hash (average-hash family): box-average the luma into
    * an 8×8 grid, set bit (y*8+x) when the cell exceeds the grid mean. Stable
    * under jpeg re-encode and raster rescale for smooth content: cell means
    * of a band-limited signal sit far from the global mean almost everywhere
    * (a DCT-median hash was measurably unstable here — sparse spectra leave
    * most coefficients at the median where one quantization step flips them).
    */
  def phash64(img: BufferedImage): Long = {
    val n = 8
    val cells = Array.ofDim[Double](n, n)
    val w = img.getWidth
    val h = img.getHeight
    var gy = 0
    while (gy < n) {
      var gx = 0
      while (gx < n) {
        val x0 = gx * w / n; val x1 = math.max(x0 + 1, (gx + 1) * w / n)
        val y0 = gy * h / n; val y1 = math.max(y0 + 1, (gy + 1) * h / n)
        var sum = 0.0
        var cnt = 0
        var yy = y0
        while (yy < y1 && yy < h) {
          var xx = x0
          while (xx < x1 && xx < w) {
            val p = img.getRGB(xx, yy)
            sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            cnt += 1
            xx += 1
          }
          yy += 1
        }
        cells(gy)(gx) = if (cnt == 0) 0.0 else sum / cnt
        gx += 1
      }
      gy += 1
    }
    var mean = 0.0
    cells.foreach(_.foreach(mean += _))
    mean /= (n * n)
    var bits = 0L
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        if (cells(y)(x) > mean) bits |= (1L << (y * n + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  def phashOfBytes(bytes: Array[Byte]): Long = phash64(decode(bytes))

  /** One-decode verification kernel: (decoded_w, decoded_h, phash, psnr). */
  def check(bytes: Array[Byte], seed: Long, w: Int, h: Int): Option[(Int, Int, Long, Double)] = {
    val img = decode(bytes)
    if (img == null) None
    else {
      val p =
        if (img.getWidth == w && img.getHeight == h) psnr(pattern(seed, w, h), img)
        else 0.0
      Some((img.getWidth, img.getHeight, phash64(img), if (p.isInfinity) 999.0 else p))
    }
  }
}
