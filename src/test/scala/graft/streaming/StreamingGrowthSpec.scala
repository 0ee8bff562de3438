package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingGrowth._

/** Pins the streaming growth-curve twin of batch `rel_cum_distinct`:
  * per-hour first-seen user counts, exact, idempotent under
  * redelivery, equal to the batch min-agg on ordered replay — and the
  * documented first-arrival divergence when events arrive out of
  * order across batches.
  */
class StreamingGrowthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  /** Latest emitted row per hour (Update-mode consumption contract). */
  private def view(table: String): Map[Long, Long] =
    spark.table(table).collect().zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (h, rows) => h -> rows.maxBy(_._2)._1.getLong(1) }

  test("ordered replay equals the batch first-touch aggregation, " +
      "and redelivery moves nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 users, interleaved activity over 6 hours, delivered in hour
    // order (ordered replay) across three micro-batches
    val hits = for {
      h <- 0L until 6L
      u <- 0L until 40L
      if (u + h) % 3 != 0
    } yield Hit(u, h)
    val in = MemoryStream[Hit]
    val q = StreamingGrowth(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("growth").start()
    try {
      val batches = hits.grouped(hits.size / 3 + 1).toSeq
      batches.foreach { b => in.addData(b); q.processAllAvailable() }

      // batch recomputation: min hour per user, counted per hour
      val want = hits.groupBy(_.user).map { case (_, hs) =>
        hs.map(_.hour).min
      }.groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
      assert(view("growth") === want)
      assert(view("growth").values.sum === 40L, "every user exactly once")

      // at-least-once redelivery of the whole first batch: no change
      in.addData(batches.head)
      q.processAllAvailable()
      assert(view("growth") === want, "redelivery inflated the curve")
    } finally q.stop()
  }

  test("out-of-order arrival keeps the first-ARRIVAL hour (documented " +
      "divergence), intra-batch disorder resolves to the min") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Hit]
    val q = StreamingGrowth(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("growth_ooo").start()
    try {
      // user 1: hours 5 then 2 within ONE batch → min (2) wins
      in.addData(Hit(1L, 5L), Hit(1L, 2L))
      q.processAllAvailable()
      assert(view("growth_ooo") === Map(2L -> 1L))
      // user 1's even-earlier hour 0 arrives a batch LATER → no
      // retraction; the emitted first-arrival hour stands
      in.addData(Hit(1L, 0L))
      q.processAllAvailable()
      assert(view("growth_ooo") === Map(2L -> 1L))
    } finally q.stop()
  }
}
