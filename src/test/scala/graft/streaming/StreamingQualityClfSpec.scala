package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins the at-ingest learned quality classifier: batch/stream score
  * parity against the oracle-checked tx_quality_clf query, the
  * unseen-bucket default, the featureless-doc default, and
  * redelivery idempotence of the stateless verdict.
  */
object StreamingQualityClfSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingQualityClfSpec extends AnyFunSuite {
  import StreamingQualityClfSpec.Doc

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private lazy val model =
    StreamingQualityClf.learn(graft.Tables.documents(spark, sf))

  test("per-row scores equal the batch tx_quality_clf query's scores") {
    // the batch query's (doc_id, vote_ppm, pred_keep) is
    // oracle-checked; the native H60BucketSum expression path must
    // reproduce those exact integers on every doc of the corpus
    val want = graft.SparkEntry.queries("tx_quality_clf")(spark, sf)
      .select("doc_id", "vote_ppm", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val got = StreamingQualityClf
      .score(graft.Tables.documents(spark, sf), model)
      .select("doc_id", "vote_ppm", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(want.nonEmpty)
    want.foreach { case (id, v) =>
      assert(got(id) === v, s"doc $id: expression path diverged")
    }
  }

  test("unseen bigrams vote at the model's nk=nd=0 default ratio") {
    import spark.implicits._
    // hand-built EMPTY models so the unseen path is deterministic:
    // training on the real corpus fills essentially every one of the
    // 1024 buckets (10k bigram occurrences at sf0.001), so a genuinely
    // unseen bucket can't be constructed from corpus data
    val doc = Seq(Doc(1L, "zzqx9k7v zzqx9k7w zzqx9k7x")).toDF()
    val dropLean = StreamingQualityClf.Model(Map.empty, defaultPpm = 0L)
    assert(StreamingQualityClf.score(doc, dropLean)
      .select("vote_ppm").head().getLong(0) === 0L)
    val keepLean =
      StreamingQualityClf.Model(Map.empty, defaultPpm = 1500000L)
    assert(StreamingQualityClf.score(doc, keepLean)
      .select("vote_ppm").head().getLong(0) === 1000000L)
  }

  test("learn on an empty corpus yields the smoothing-only default, not an NPE") {
    import spark.implicits._
    // empty frame → the class-total sums are NULL; learn must
    // coalesce them to 0 (default ratio (0+B)/(0+B) = even odds)
    // instead of throwing out of getLong (ADVICE r11)
    val m = StreamingQualityClf.learn(Seq.empty[Doc].toDF())
    assert(m.rPpm.isEmpty)
    assert(m.defaultPpm === 1000000L)
  }

  test("featureless docs score the even-odds default") {
    import spark.implicits._
    val got = StreamingQualityClf.score(Seq(Doc(1L, "one")).toDF(), model)
      .select("vote_ppm").head().getLong(0)
    assert(got === graft.queries.TextQueries.QcKeepPpm)
  }

  test("streaming verdicts match batch and redelivery re-emits identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[Doc].head(3).toSeq
    val batch = StreamingQualityClf.score(docs.toDF(), model)
      .select("doc_id", "vote_ppm", "pred_keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    val in = MemoryStream[Doc]
    val q = StreamingQualityClf.score(in.toDF(), model)
      .writeStream.format("memory").queryName("qclf_stream")
      .outputMode("append").start()
    try {
      in.addData(docs: _*); q.processAllAvailable()
      // at-least-once redelivery of the same batch
      in.addData(docs: _*); q.processAllAvailable()
      val rows = spark.table("qclf_stream")
        .select("doc_id", "vote_ppm", "pred_keep").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.length === 2 * docs.length, "stateless append re-emits")
      rows.groupBy(_._1).foreach { case (id, vs) =>
        assert(vs.distinct.size === 1,
          s"doc $id: redelivery changed the verdict")
        val (_, s, k) = vs.head
        assert((s, k) === batch(id),
          s"doc $id: stream diverged from batch")
      }
    } finally q.stop()
  }
}
