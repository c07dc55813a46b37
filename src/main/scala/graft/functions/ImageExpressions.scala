package graft.functions

import graft.image.ImageCodec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static call targets for generated code (decode runs on the crawl's
  * per-image hot path — a direct static call keeps it inside whole-stage
  * codegen with no CodegenFallback row-boxing). */
object ImageKernels {

  def genImage(seed: Long, w: Int, h: Int, fmt: UTF8String): Array[Byte] =
    ImageCodec.generate(seed, w, h, fmt.toString)

  /** Fused decode+phash+psnr; null ⇔ undecodable bytes. */
  def imageCheck(bytes: Array[Byte], seed: Long, w: Int, h: Int): InternalRow =
    ImageCodec.check(bytes, seed, w, h) match {
      case Some((dw, dh, ph, ps)) => InternalRow(dw, dh, ph, ps)
      case None => null
    }

  def decodeDims(bytes: Array[Byte]): InternalRow = {
    val img = ImageCodec.decode(bytes)
    if (img == null) null else InternalRow(img.getWidth, img.getHeight)
  }

  def phash64(bytes: Array[Byte]): java.lang.Long = {
    val img = ImageCodec.decode(bytes)
    if (img == null) null else java.lang.Long.valueOf(ImageCodec.phash64(img))
  }

  def psnrVsPattern(bytes: Array[Byte], seed: Long, w: Int, h: Int): java.lang.Double = {
    val img = ImageCodec.decode(bytes)
    if (img == null) return null
    val ref = ImageCodec.pattern(seed, w, h)
    val p = ImageCodec.psnr(ref, img)
    java.lang.Double.valueOf(if (p.isInfinity) 999.0 else p)
  }

  /** [[ImageFeatureStub]]'s kernel: mean RGB of a dims-cell column stripe —
    * deterministic, decode-backed; null ⇔ undecodable bytes. */
  def imageFeatureStub(bytes: Array[Byte], dims: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val img = ImageCodec.decode(bytes)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      val x0 = d * w / dims
      val x1 = math.max(x0 + 1, (d + 1) * w / dims)
      var sum = 0.0
      var n = 0
      var y = 0
      while (y < h) {
        var x = x0
        while (x < x1 && x < w) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          n += 3
          x += 1
        }
        y += 1
      }
      out(d) = if (n == 0) 0.0 else sum / n / 255.0
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Multimodal (image) column expressions: synthesis, decode, perceptual
  * hashing. Images are opaque `binary` columns with typed metadata — the
  * decode/feature stages run inside projections (one narrow stage, no
  * shuffle), which is the Spark-native shape for 100 TB of media blobs.
  */

/** Deterministic image synthesis: (seed, w, h, fmt) → encoded bytes. */
case class GenImage(seed: Expression, w: Expression, h: Expression, fmt: Expression)
    extends QuaternaryExpression {
  override def first: Expression = seed
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = fmt
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gen_image"
  override def nullSafeEval(s: Any, wv: Any, hv: Any, f: Any): Any =
    ImageKernels.genImage(s.asInstanceOf[Long], wv.asInstanceOf[Int],
      hv.asInstanceOf[Int], f.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w, h, f) =>
      s"graft.functions.ImageKernels.genImage($s, $w, $h, $f)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(seed = a, w = b, h = c, fmt = d)
}

/** Decode image bytes → struct(w, h) (null on undecodable input). */
case class DecodeImageDims(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType)))
  override def nullable: Boolean = true // null <=> undecodable bytes
  override def prettyName: String = "decode_image_dims"
  override def nullSafeEval(input: Any): Any =
    ImageKernels.decodeDims(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.functions.ImageKernels.decodeDims($b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Perceptual hash of encoded image bytes. */
case class PHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null <=> undecodable bytes
  override def prettyName: String = "phash64"
  override def nullSafeEval(input: Any): Any =
    ImageKernels.phash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      java.lang.Long ph_${ev.value} = graft.functions.ImageKernels.phash64($b);
      ${ev.isNull} = ph_${ev.value} == null;
      if (!${ev.isNull}) ${ev.value} = ph_${ev.value}.longValue();""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PSNR (dB) of image bytes against the regenerated seeded pattern; the
  * per-row decode invariant (∞ → encoded as 999.0 for a stable column). */
case class PsnrVsPattern(bytes: Expression, seed: Expression, w: Expression, h: Expression)
    extends QuaternaryExpression {
  override def first: Expression = bytes
  override def second: Expression = seed
  override def third: Expression = w
  override def fourth: Expression = h
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null <=> undecodable bytes
  override def prettyName: String = "psnr_vs_pattern"
  override def nullSafeEval(b: Any, s: Any, wv: Any, hv: Any): Any =
    ImageKernels.psnrVsPattern(b.asInstanceOf[Array[Byte]], s.asInstanceOf[Long],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, w, h) => s"""
      java.lang.Double ps_${ev.value} = graft.functions.ImageKernels.psnrVsPattern($b, $s, $w, $h);
      ${ev.isNull} = ps_${ev.value} == null;
      if (!${ev.isNull}) ${ev.value} = ps_${ev.value}.doubleValue();""")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(bytes = a, seed = b, w = c, h = d)
}

/** One-decode image verification: (bytes, seed, w, h) →
  * struct(decoded_w, decoded_h, phash, psnr) — the fused kernel for the crawl
  * epoch's per-row invariant so each blob is decoded exactly once. */
case class ImageCheck(bytes: Expression, seed: Expression, w: Expression, h: Expression)
    extends QuaternaryExpression {
  override def first: Expression = bytes
  override def second: Expression = seed
  override def third: Expression = w
  override def fourth: Expression = h
  override def dataType: DataType = StructType(Seq(
    StructField("decoded_w", IntegerType),
    StructField("decoded_h", IntegerType),
    StructField("phash", LongType),
    StructField("psnr", DoubleType)))
  override def nullable: Boolean = true // null ⇔ undecodable bytes
  override def prettyName: String = "image_check"
  override def nullSafeEval(b: Any, s: Any, wv: Any, hv: Any): Any =
    ImageKernels.imageCheck(b.asInstanceOf[Array[Byte]], s.asInstanceOf[Long],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, w, h) => s"""
      ${ev.value} = graft.functions.ImageKernels.imageCheck($b, $s, $w, $h);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(bytes = a, seed = b, w = c, h = d)
}

/** STUB — multimodal feature extraction beyond decode (object tags, audio
  * spectrograms, video frame sampling) would sit behind this same expression
  * shape; the container has no media ML libraries, so the feature vector is a
  * deterministic fake derived from the decoded pixels (documented stub, not
  * a silent one). Codegen'd like every other kernel (static call into
  * [[ImageKernels]]) — the expression shape a real feature extractor would
  * inherit is fully wired, including null-on-undecodable. */
case class ImageFeatureStub(child: Expression, dims: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // null <=> undecodable bytes
  override def prettyName: String = "image_feature_stub"
  override def nullSafeEval(input: Any): Any =
    ImageKernels.imageFeatureStub(input.asInstanceOf[Array[Byte]], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.functions.ImageKernels.imageFeatureStub($b, $dims);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
