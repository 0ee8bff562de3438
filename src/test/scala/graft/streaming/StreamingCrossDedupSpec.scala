package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCrossDedup._
import graft.streaming.StreamingNearDup.Doc

class StreamingCrossDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog and runs far away now"
  private val unrelated =
    "completely different words about spark structured streaming state stores"

  private def corpus() = {
    import spark.implicits._
    corpusIndex(Seq((10L, base), (20L, unrelated)).toDF("doc_id", "text"))
  }

  test("corpus index rows carry the batch-parity signature per band") {
    val idx = corpus().collect()
    // Bands rows per corpus doc, all with the full signature
    assert(idx.length === graft.queries.DedupQueries.Bands * 2)
    val sig = StreamingNearDup.signature(base).get
    idx.filter(_.getAs[Long]("corpus_id") == 10L).foreach { r =>
      assert(r.getAs[Seq[Long]]("csig") === sig.toSeq)
    }
  }

  test("an arriving near-dup of a corpus doc is flagged exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = matches(in.toDS(), corpus(), minAgree = 16)
      .writeStream.format("memory").queryName("xdedup_out")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, nearDup), Doc(2L, "totally novel content here for sure"))
      q.processAllAvailable()
      val rows = spark.table("xdedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((1L, 10L)),
        s"expected exactly one (arrival, corpus) match, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("an identical arrival (all bands collide) still emits once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = matches(in.toDS(), corpus(), minAgree = 16)
      .writeStream.format("memory").queryName("xdedup_once")
      .outputMode("append").start()
    try {
      in.addData(Doc(3L, base)) // identical to corpus doc 10
      q.processAllAvailable()
      val rows = spark.table("xdedup_once").collect()
      assert(rows.length === 1, s"expected one emission, got ${rows.length}")
      assert(rows.head.getLong(0) === 3L && rows.head.getLong(1) === 10L)
      assert(rows.head.getLong(2) === graft.queries.DedupQueries.K.toLong,
        "identical texts must agree on the full signature")
    } finally q.stop()
  }
}
