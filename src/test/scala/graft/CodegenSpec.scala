package graft

import graft.functions.GraftFunctions

import org.apache.spark.sql.functions._

/** Whole-stage codegen must actually COMPILE for every kernel-backed
  * expression: with `spark.sql.codegen.fallback=false` a Janino failure
  * (e.g. a static forwarder missing because a kernel was placed on a
  * companion whose name collides with an inherited member) throws instead
  * of silently de-optimizing the stage. */
class CodegenSpec extends SparkSpecBase {

  test("all kernel-backed expressions compile under forced whole-stage codegen") {
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(16).selectExpr(
        "id",
        "concat('<html><head><meta name=\"license\" content=\"https://creativecommons.org/licenses/by/4.0/\"></head>'," +
          "'<body><p>T ', id, '</p><a href=\"http://x/', id, '\">L</a></body></html>') AS html",
        "concat('https://creativecommons.org/licenses/by-sa/', (id % 3) + 2, '.0/') AS url",
        "concat('word', id, ' text %41 sample') AS text")
      val n = df.select(
          GraftFunctions.extractCcLicenses(col("html")).getField("parse_error"),
          call_function("parse_cc_license_url", col("url")),
          GraftFunctions.extractLinks(col("html")),
          call_function("extract_visible_text", col("html")),
          call_function("normalize_nfc", col("text")),
          call_function("url_decode_py", col("text")),
          call_function("minhash_sig", col("text")),
          call_function("winnow_fingerprint", col("text")),
          call_function("simhash64", col("text")),
          call_function("shingle_set", col("text"), lit(2)))
        .count()
      assert(n === 16)
      val img = spark.range(8).select(
        col("id"),
        GraftFunctions.genImage(col("id"), lit(16), lit(16), lit("png")).as("bytes"))
      val m = img.select(
          GraftFunctions.imageCheck(col("bytes"), col("id"), lit(16), lit(16)),
          call_function("decode_image_dims", col("bytes")),
          call_function("phash64", col("bytes")),
          call_function("psnr_vs_pattern", col("bytes"), col("id"), lit(16), lit(16)),
          call_function("image_feature_stub", col("bytes")))
        .count()
      assert(m === 8)
      // feature stub: null on undecodable bytes, 8 dims in [0,1] otherwise
      val feats = img.select(
          call_function("image_feature_stub", col("bytes")).as("f"))
        .withColumn("bad",
          call_function("image_feature_stub", lit(Array[Byte](1, 2, 3))))
        .collect()
      assert(feats.forall(_.isNullAt(1)))
      assert(feats.forall { r =>
        val f = r.getSeq[Double](0)
        f.length == 8 && f.forall(v => v >= 0.0 && v <= 1.0)
      })
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
