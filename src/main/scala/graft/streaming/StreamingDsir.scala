package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** DSIR importance scoring at ingest — the streaming twin of the
  * batch `tx_dsir`/`pipe_dsir` queries (Xie et al. 2023): score every
  * arriving document against an already-learned hashed-unigram
  * importance model, so the curation chain can gate admission on
  * "does this look like the target corpus" the moment the change
  * stream delivers it.
  *
  * Train/serve split mirrors every aggregate-learned operator here
  * (tx_langid_ngram's profile tables, StreamingCrossDedup's staged
  * band index): the model is learned BATCH-side from a finished
  * corpus snapshot ([[TextQueries.dsirRatio]], O(B=4096) rows no
  * matter the corpus size) and served as a driver-collected map
  * literal — the broadcast-the-model pattern; the collect is
  * model-sized, never corpus-sized. Scoring itself is ONE per-row
  * fold over the token array with a map lookup per token
  * ([[TextQueries.dsirScoreExpr]]): no shuffle, no state, Append
  * mode, trivially idempotent under at-least-once redelivery (a
  * redelivered doc re-emits the same verdict row; the downstream
  * idempotent-upsert sink — ExactlyOnceSinkSpec's contract —
  * absorbs it).
  *
  * Buckets unseen in the training corpus score at the model's
  * add-one-smoothed empty-bucket default ((1e6*(R+B)) div (T+B)),
  * the exact value batch DSIR would assign a count-zero bucket — so
  * a stream doc whose tokens all hashed into seen buckets gets a
  * score bit-identical to the batch path (StreamingDsirSpec pins
  * this parity).
  */
object StreamingDsir {

  /** The learned model: bucket -> importance ppm, plus the
    * unseen-bucket default.
    */
  final case class Model(ppm: Map[Long, Long], defaultPpm: Long)

  /** Learn the model from a finished corpus frame (batch-side).
    * Driver materializes O(B) rows — model-sized, sanctioned.
    */
  def learn(corpus: DataFrame): Model = {
    val (ratio, tots) = TextQueries.dsirRatio(corpus)
    val m = ratio.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = tots.collect().head
    val b = graft.queries.TextQueries.DsirB
    Model(m, (1000000L * (t.getLong(0) + b)) / (t.getLong(1) + b))
  }

  /** Score a (batch or streaming) frame with a `text` column: adds
    * `score_ppm`. Pure projection — composes anywhere in the ingest
    * chain. The map model densifies to a B-slot array literal here
    * (unseen buckets get defaultPpm), because a literal-MAP lookup
    * linear-scans all B entries per token (see dsirScoreExpr).
    */
  def score(docs: DataFrame, model: Model): DataFrame =
    docs.withColumn("score_ppm",
      TextQueries.dsirScoreExpr(col("text"), dense(model)))

  private def dense(model: Model): Seq[Long] =
    Seq.tabulate(TextQueries.DsirB)(i =>
      model.ppm.getOrElse(i.toLong, model.defaultPpm))

  /** Score + admission verdict against a minimum importance. */
  def admit(docs: DataFrame, model: Model, minPpm: Long): DataFrame =
    score(docs, model).withColumn("admitted", col("score_ppm") >= minPpm)
}
