package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real `javax.imageio` decode path: PNG round-trips exactly
  * against the rendered pattern, JPEG agrees with a driver-side decode
  * of the same bytes (lossy, so the oracle is the decoder itself),
  * non-image and corrupt payloads fall back to the stub, and q128's
  * registry pipeline decodes every synthetic PNG it renders.
  */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference luma sums straight off a BufferedImage. */
  private def refStats(img: java.awt.image.BufferedImage): (Long, Long) = {
    var luma = 0L; var resized = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      val l = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)) / 1000L
      luma += l
      if ((x & 1) == 0 && (y & 1) == 0) resized += l
    }
    (luma, resized)
  }

  test("PNG decodes exactly: dimensions, pixel count, luma, resized luma") {
    val png = MultimodalQueries.syntheticPng(seed = 42L, w = 13, h = 9)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val (luma, resized) = refStats(img)
    val out = Seq((1L, "s", png)).toDF("doc_id", "source", "payload")
    val row = MultimodalQueries.imageFeatures(out).head()
    assert(row.getAs[String]("format") === "png")
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("width") === 13 && row.getAs[Int]("height") === 9)
    assert(row.getAs[Long]("n_pixels") === 117L)
    assert(row.getAs[Long]("luma_sum") === luma)
    assert(row.getAs[Long]("resized_luma_sum") === resized)
    // PNG is lossless: the decoded pattern IS the rendered pattern
    val expected = {
      var l = 0L
      for (y <- 0 until 9; x <- 0 until 13) {
        val r = (42L + x) % 256; val g = (42L / 7 + y) % 256
        val b = (42L / 31 + x + y) % 256
        l += (299L * r + 587L * g + 114L * b) / 1000L
      }
      l
    }
    assert(luma === expected, "ImageIO round-trip drifted from the pattern")
  }

  test("JPEG decodes through the same path (stats vs driver-side decode of the same bytes)") {
    val img = new java.awt.image.BufferedImage(
      16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 20) << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpeg = out.toByteArray
    val (luma, resized) = refStats(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg)))
    val row = MultimodalQueries.imageFeatures(
      Seq((1L, "s", jpeg)).toDF("doc_id", "source", "payload")).head()
    assert(row.getAs[String]("format") === "jpeg")
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("width") === 16 && row.getAs[Int]("height") === 12)
    assert(row.getAs[Long]("luma_sum") === luma)
    assert(row.getAs[Long]("resized_luma_sum") === resized)
  }

  test("non-image and corrupt payloads fall back to the stub, not an error") {
    val textPayload = "just some text bytes".getBytes("UTF-8")
    val corruptPng = MultimodalQueries.syntheticPng(1L, 8, 8).take(20) // truncated
    val rows = MultimodalQueries.imageFeatures(
        Seq((1L, "s", textPayload), (2L, "s", corruptPng),
            (3L, "s", null.asInstanceOf[Array[Byte]]))
          .toDF("doc_id", "source", "payload"))
      .orderBy($"doc_id").collect()
    assert(rows.forall(!_.getAs[Boolean]("decoded")))
    assert(rows.forall(_.getAs[String]("format") === "opaque"))
    // stub stand-ins: n_pixels = stub frame count, luma_sum = header sum
    val (nb, nf, hs) = MultimodalQueries.decodeStub(textPayload)
    assert(rows(0).getAs[Long]("n_pixels") === nf)
    assert(rows(0).getAs[Long]("luma_sum") === hs)
    assert(rows(0).getAs[Long]("resized_luma_sum") === nb)
  }

  test("q128 decodes every synthetic PNG it renders") {
    val out = graft.SparkEntry.queries("q128_image_decode")(
      spark, SparkSpec.Sf0001).collect()
    assert(out.nonEmpty)
    val n = out.map(_.getAs[Long]("n_images")).sum
    val d = out.map(_.getAs[Long]("n_decoded")).sum
    assert(n === 200L && d === 200L, s"decoded $d of $n")
    assert(out.forall(_.getAs[Long]("total_pixels") > 0))
  }
}
