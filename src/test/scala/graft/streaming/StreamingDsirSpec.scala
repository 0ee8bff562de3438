package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the at-ingest DSIR scorer: batch/stream score parity against
  * the oracle-checked tx_dsir query, unseen-bucket default behavior,
  * and redelivery idempotence of the stateless verdict.
  */
object StreamingDsirSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingDsirSpec extends AnyFunSuite {
  import StreamingDsirSpec.Doc

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private lazy val model = StreamingDsir.learn(graft.Tables.documents(spark, sf))

  test("per-row scores equal the batch tx_dsir query's scores") {
    // tx_dsir's top-100 (doc_id, lang, score_ppm) is oracle-checked;
    // the expression path must reproduce those exact scores
    val want = graft.SparkEntry.queries("tx_dsir")(spark, sf)
      .select("doc_id", "score_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = StreamingDsir.score(graft.Tables.documents(spark, sf), model)
      .select("doc_id", "score_ppm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty)
    want.foreach { case (id, s) =>
      assert(got(id) === s, s"doc $id: expression path diverged")
    }
  }

  test("unseen tokens score at the add-one-smoothed empty-bucket default") {
    import spark.implicits._
    // a token not in the corpus hashes (with near certainty) to a
    // bucket carrying no model entry; 3 such tokens -> 3 * default
    val novel = "zzqx9k7v zzqx9k7w zzqx9k7x"
    val got = StreamingDsir.score(
      Seq(Doc(1L, novel)).toDF(), model)
      .select("score_ppm").head().getLong(0)
    assert(got === 3L * model.defaultPpm)
  }

  test("streaming scores match batch and redelivery re-emits identical verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[Doc].head(3).toSeq
    val batchScores = StreamingDsir
      .admit(docs.toDF(), model, minPpm = 0L)
      .select("doc_id", "score_ppm", "admitted").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val in = MemoryStream[Doc]
    val q = StreamingDsir.admit(in.toDF(), model, minPpm = 0L)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      in.addData(docs: _*); q.processAllAvailable()
      // at-least-once redelivery of the same batch
      in.addData(docs: _*); q.processAllAvailable()
      val rows = spark.table("dsir_stream")
        .select("doc_id", "score_ppm", "admitted").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.length === 2 * docs.length, "stateless append re-emits")
      rows.groupBy(_._1).foreach { case (id, vs) =>
        assert(vs.distinct.size === 1,
          s"doc $id: redelivery changed the verdict")
        val (_, s, a) = vs.head
        assert((s, a) === batchScores(id),
          s"doc $id: stream diverged from batch")
      }
    } finally q.stop()
  }
}
