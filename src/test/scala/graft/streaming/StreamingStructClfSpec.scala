package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins the at-ingest STRUCTURAL-feature classifier (the generalizing
  * one): per-row metric/bin parity against the oracle-checked
  * tx_clf_struct query on the real corpus, the empty-corpus learn
  * path, and redelivery idempotence of the stateless verdict.
  */
object StreamingStructClfSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingStructClfSpec extends AnyFunSuite {
  import StreamingStructClfSpec.Doc

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("held-out scores equal the batch tx_clf_struct query's scores") {
    import org.apache.spark.sql.functions.col
    // the batch query trains on even doc_ids and scores the odd half;
    // its (doc_id, vote_ppm, pred_keep) is oracle-checked. The
    // streaming path must reproduce those exact integers from PER-ROW
    // metric expressions (no staged table, no corpus-wide agg) — this
    // pins that the row-level ttr/top-frac/dup-3-gram arithmetic and
    // the bin floors are bit-identical to the batch derivation.
    val docs = graft.Tables.documents(spark, sf)
    val model = StreamingStructClf.learn(docs.filter(col("doc_id") % 2 === 0))
    val want = graft.SparkEntry.queries("tx_clf_struct")(spark, sf)
      .select("doc_id", "vote_ppm", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val got = StreamingStructClf
      .score(docs.filter(col("doc_id") % 2 === 1), model)
      .select("doc_id", "vote_ppm", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(want.nonEmpty && got.keySet == want.keySet)
    want.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id: per-row path diverged from batch")
    }
  }

  test("learn on an empty corpus yields the even-odds default, not an NPE") {
    import spark.implicits._
    val m = StreamingStructClf.learn(Seq.empty[Doc].toDF())
    assert(m.rPpm.isEmpty)
    assert(m.defaultPpm === 1000000L)
  }

  test("streaming verdicts match batch and redelivery re-emits identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[Doc].head(3).toSeq
    val model = StreamingStructClf.learn(
      graft.Tables.documents(spark, sf))
    val batch = StreamingStructClf.score(docs.toDF(), model)
      .select("doc_id", "vote_ppm", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val in = MemoryStream[Doc]
    val q = StreamingStructClf.score(in.toDF(), model)
      .writeStream.format("memory").queryName("sclf_stream")
      .outputMode("append").start()
    try {
      in.addData(docs: _*); q.processAllAvailable()
      in.addData(docs: _*); q.processAllAvailable() // at-least-once replay
      val rows = spark.table("sclf_stream")
        .select("doc_id", "vote_ppm", "pred_keep").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.length === 2 * docs.length, "stateless append re-emits")
      rows.groupBy(_._1).foreach { case (id, vs) =>
        assert(vs.distinct.size === 1,
          s"doc $id: redelivery changed the verdict")
        val (_, s, k) = vs.head
        assert((s, k) === batch(id), s"doc $id: stream diverged from batch")
      }
    } finally q.stop()
  }
}
