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

  test("aHash sets exactly the above-mean bits (oracle arithmetic)") {
    // samples 0,0,...,0,100: mean > 0 only the last bit qualifies
    val luma = Array.fill(PHashBits)(0)
    luma(PHashBits - 1) = 100
    assert(aHash(luma) === (1L << (PHashBits - 1)))
    // uniform strip: nothing is strictly above the mean
    assert(aHash(Array.fill(PHashBits)(7)) === 0L)
  }

  test("stub luma samples bytes at floor(i*len/n) (oracle arithmetic)") {
    val content = (0 until 90).map(_.toByte).toArray
    val luma = StubDecoder.luma("img/x", content, 60)
    assert(luma.toSeq === (0 until 60).map(i => (i * 90 / 60) & 0xff))
    // payload shorter than the sample count: positions repeat, never
    // run off the end
    val short = Array[Byte](5, 9)
    assert(StubDecoder.luma("img/x", short, 60).toSeq ===
      (0 until 60).map(i => if (i * 2 / 60 == 0) 5 else 9))
  }

  test("perceptual hash: near-identical real images collide, differing ones differ") {
    import spark.implicits._
    // img2 = img1 with a tiny corner tweak; img3 = inverted gradient
    val img1 = realPng(32, 20)
    val img3 = {
      import java.awt.image.BufferedImage
      val img = new BufferedImage(32, 20, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 32; y <- 0 until 20)
        img.setRGB(x, y, ((255 - x * 8) << 16) | ((255 - y * 12) << 8))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val img2 = {
      import java.awt.image.BufferedImage
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(img1))
      img.setRGB(0, 0, 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val media = Seq(
      MediaRow(1L, "img/png", img1),
      MediaRow(2L, "img/png", img2),
      MediaRow(3L, "img/png", img3)).toDS()
    val hashes = perceptualHash(media, ImageIoDecoder)
      .collect().map(h => h.media_id -> h.phash).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one tweaked pixel barely moves the 60-sample average hash...
    assert(hamming(hashes(1L), hashes(2L)) <= 4)
    // ...an inverted gradient moves most of it
    assert(hamming(hashes(1L), hashes(3L)) > 15)
  }

  // --- the shared chunk/stride sampling core (sampleFrames/frameLuma) ---
  // The SQL oracle twins (mm_frames, mm_scene_cut) mirror this
  // chunking byte-for-byte; these pin its laws through both consumers.

  test("stride-1 frames reconstruct the payload exactly") {
    import spark.implicits._
    val payload = Array.tabulate(100)(i => (i * 7 + 3).toByte)
    val frames = sampleFrames(
      Seq(MediaRow(1L, "img/x", payload)).toDS(), chunkBytes = 32, stride = 1)
      .collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(frames.map(_.n_bytes).sum === 100L) // 32+32+32+4: nothing dropped
    assert(frames.last.n_bytes === 4L) // the short tail chunk survives
  }

  test("frameLuma matches the plain-Scala mean and keeps stride numbering") {
    import spark.implicits._
    val payload = Array.tabulate(100)(i => (i * 31 + 128).toByte)
    val got = frameLuma(
      Seq(MediaRow(1L, "v/x", payload)).toDS(), chunkBytes = 16, stride = 3)
      .collect().map(f => f.frame_no -> f.luma).toMap
    val want = payload.grouped(16).zipWithIndex
      .filter(_._2 % 3 == 0)
      .map { case (c, i) =>
        i.toLong -> c.map(b => (b & 0xff).toLong).sum / c.length
      }.toMap
    assert(got === want)
    assert(got.keySet === Set(0L, 3L, 6L)) // chunk numbers, not kept-rank
    assert(got.values.forall(l => l >= 0L && l <= 255L))
  }

  test("a null payload yields no frames from either consumer") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "img/x", null),
      MediaRow(2L, "img/x", Array[Byte](1, 2, 3))).toDS()
    assert(sampleFrames(media, 2, 1).collect().forall(_.media_id == 2L))
    assert(frameLuma(media, 2, 1).collect().forall(_.media_id == 2L))
    assert(sampleFrames(media, 2, 1).count() === 2L)
  }

  test("testdata guard: documents.text is pure ASCII (byte/char twins)") {
    // The mm_scene_cut / mm_keyframes oracles luma CHARACTERS
    // (substr + ascii) while the Spark side lumas UTF-8 BYTES — the
    // twins agree exactly iff 1 char = 1 byte. This guard fails the
    // suite (instead of a silent oracle drift) if a testdata refresh
    // ever introduces multibyte text.
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val nonAscii = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii === 0L,
      s"$nonAscii documents carry multibyte text — the character-" +
        "offset oracle CTEs (sqlLumaCtes and every byte/char twin) " +
        "no longer replay the byte-level Spark side")
  }
}
