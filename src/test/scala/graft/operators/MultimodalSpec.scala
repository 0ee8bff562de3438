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
}
