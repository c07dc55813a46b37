package graft

import graft.image.ImageCodec
import org.scalatest.funsuite.AnyFunSuite

/** Per-row payload invariants from BASELINE.md: decoded pixels exact for
  * png/bmp, PSNR ≥ 40 dB for jpeg; phash round-trips. */
class ImageCodecSpec extends AnyFunSuite {

  private val cases = for {
    seed <- Seq(1L, 42L, 12345L)
    (w, h) <- Seq((16, 16), (64, 48), (128, 128))
    fmt <- Seq("png", "bmp", "jpeg")
  } yield (seed, w, h, fmt)

  cases.foreach { case (seed, w, h, fmt) =>
    test(s"round-trip seed=$seed ${w}x$h $fmt") {
      val bytes = ImageCodec.generate(seed, w, h, fmt)
      val decoded = ImageCodec.decode(bytes)
      assert(decoded.getWidth === w)
      assert(decoded.getHeight === h)
      val ref = ImageCodec.pattern(seed, w, h)
      val p = ImageCodec.psnr(ref, decoded)
      if (fmt == "jpeg") assert(p >= 40.0, s"psnr=$p")
      else assert(p.isInfinity, s"lossless format not bit-exact, psnr=$p")
    }
  }

  test("phash is stable across lossless formats and jpeg-close") {
    val seed = 7L
    val png = ImageCodec.phashOfBytes(ImageCodec.generate(seed, 64, 64, "png"))
    val bmp = ImageCodec.phashOfBytes(ImageCodec.generate(seed, 64, 64, "bmp"))
    val jpg = ImageCodec.phashOfBytes(ImageCodec.generate(seed, 64, 64, "jpeg"))
    assert(png === bmp)
    assert(java.lang.Long.bitCount(png ^ jpg) <= 4, "jpeg phash drifted")
  }

  test("phash distinguishes different patterns") {
    val a = ImageCodec.phash64(ImageCodec.pattern(1L, 64, 64))
    val b = ImageCodec.phash64(ImageCodec.pattern(999L, 64, 64))
    assert(java.lang.Long.bitCount(a ^ b) >= 10, f"too close: ${a ^ b}%x")
  }

  test("phash is resize-invariant-ish (same pattern, different raster)") {
    val a = ImageCodec.phash64(ImageCodec.pattern(5L, 64, 64))
    val b = ImageCodec.phash64(ImageCodec.pattern(5L, 128, 128))
    assert(java.lang.Long.bitCount(a ^ b) <= 6)
  }
}
