package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal._

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  test("repartitionBySize balances by cumulative payload bytes") {
    import spark.implicits._
    val media = (1L to 64L)
      .map(i => MediaRow(i, "img/x", Array.fill(1024)(i.toByte)))
      .toDS()
    val out = repartitionBySize(media, targetBytesPerPartition = 8 * 1024)
    assert(out.rdd.getNumPartitions === 8)
    assert(out.count() === 64)
  }

  test("repartitionBySize on an empty dataset is a no-op, not an NPE") {
    // sum(length(content)) over zero rows is NULL; the previous
    // .getLong(0) read threw NullPointerException here.
    import spark.implicits._
    val empty = spark.emptyDataset[MediaRow]
    val out = repartitionBySize(empty, targetBytesPerPartition = 1024)
    assert(out.count() === 0)
  }

  test("repartitionBySize with zero-byte payloads short-circuits") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "img/x", Array.emptyByteArray)).toDS()
    val out = repartitionBySize(media, targetBytesPerPartition = 1024)
    assert(out.count() === 1)
  }

  /** A real PNG: 32×20, per-pixel gradient so downscaling has content
    * to resample.
    */
  private def realPng(w: Int, h: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 8 << 16) | (y * 12 << 8) | ((x + y) * 4))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("ImageIoDecoder decodes actual PNG bytes through extractFeatures") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "img/png", realPng(32, 20)),
      MediaRow(2L, "img/png", realPng(7, 3))).toDS()
    val feats = extractFeatures(media, ImageIoDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.map(f => (f.width, f.height)).toSeq ===
      Seq((32L, 20L), (7L, 3L)))
    assert(feats.forall(_.n_bytes > 0))
  }

  test("ImageIoDecoder downsamples a real PNG through resize (stride 4)") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "img/png", realPng(32, 20))).toDS()
    val r = resize(media, stride = 4, ImageIoDecoder).head()
    // decode→scale→re-encode: dims are the true scaled-image dims and
    // the payload is a real PNG again
    assert((r.width, r.height) === (8L, 5L))
    assert(r.resized_bytes > 0 && r.resized_bytes < r.orig_bytes)
    // floor-to-1 clamp: scaling a tiny image never hits 0×0
    val tiny = Seq(MediaRow(2L, "img/png", realPng(2, 2))).toDS()
    val rt = resize(tiny, stride = 4, ImageIoDecoder).head()
    assert((rt.width, rt.height) === (1L, 1L))
  }

  test("ImageIoDecoder rejects non-image payloads loudly") {
    intercept[IllegalArgumentException] {
      ImageIoDecoder.dims("img/x", "not an image".getBytes)
    }
  }

  test("decoderFor selects by config name; stub stays the default") {
    assert(decoderFor("imageio") eq ImageIoDecoder)
    assert(decoderFor("stub") eq StubDecoder)
    assert(decoderFor("anything-else") eq StubDecoder)
  }

  test("stub downscale keeps every stride-th byte (oracle arithmetic)") {
    val content = (0 until 100).map(_.toByte).toArray
    val out = StubDecoder.downscale("img/x", content, 4)
    assert(out.toSeq === content.indices.filter(_ % 4 == 0).map(content(_)))
  }
}
