package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Learned quality classification at ingest — the streaming twin of
  * the batch `tx_quality_clf` query (the DCLM/fastText curation
  * pass): every arriving document is scored, the moment the change
  * stream delivers it, against per-bucket keep/drop likelihood-ratio
  * weights learned batch-side from the rule-labeled gate
  * (`TextQueries.qualityClfParts`).
  *
  * Exactly the StreamingDsir broadcast-model shape: the model is
  * O([[TextQueries.QcB]]) rows no matter the corpus size, collected
  * driver-side once (model-sized, never corpus-sized) and densified
  * to a QcB-slot array served through the native
  * [[graft.functions.H60BucketSum]] loop — one codegen'd call per
  * row ([[TextQueries.qualityClfScoreExpr]]; a map-literal lookup
  * measured 2.6k docs/s before the switch) — no shuffle, no state,
  * Append mode, trivially idempotent under at-least-once redelivery
  * (a redelivered doc re-emits the same verdict row; the
  * idempotent-upsert sink contract absorbs it).
  *
  * Buckets no training occurrence ever hit score the model's own
  * nk=nd=0 ratio — (TND+B)·1e6 div (TNK+B) — so a stream doc whose
  * bigrams all hashed into seen buckets gets a vote_ppm
  * bit-identical to the batch path (StreamingQualityClfSpec pins
  * this parity on the real corpus).
  */
object StreamingQualityClf {

  /** The learned model: bucket -> keep/drop likelihood ratio (ppm),
    * plus the unseen-bucket default (the nk=nd=0 ratio).
    */
  final case class Model(rPpm: Map[Long, Long], defaultPpm: Long)

  /** Learn the model from a finished corpus frame (batch-side).
    * Driver materializes O(QcB) + 1 rows — model-sized, sanctioned.
    */
  def learn(corpus: DataFrame): Model = {
    val (_, _, wts, tots) = TextQueries.qualityClfParts(corpus)
    val m = wts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // On an empty or featureless corpus the class-total sums are
    // NULL — coalesce to 0 so the default ratio degrades to the
    // smoothing-only value (B+0)/(B+0) = even odds, instead of an
    // opaque NPE out of getLong (ADVICE r11).
    val t = tots.collect().head
    val tnk = if (t.isNullAt(0)) 0L else t.getLong(0)
    val tnd = if (t.isNullAt(1)) 0L else t.getLong(1)
    val b = TextQueries.QcB
    Model(m, ((tnd + b) * 1000000L) / (tnk + b))
  }

  /** Score a (batch or streaming) frame with a `text` column: adds
    * `vote_ppm` (the fraction of bigram occurrences in keep-leaning
    * buckets) and the `pred_keep` majority verdict. Pure projection —
    * composes anywhere in the ingest chain. The map model densifies
    * to a QcB-slot array literal here (unseen buckets get
    * defaultPpm): a literal-MAP lookup linear-scans all entries per
    * bigram — measured 2.6k docs/s before the switch, ~25× below
    * the hash-bound rate (see qualityClfScoreExpr).
    */
  def score(docs: DataFrame, model: Model): DataFrame =
    docs
      .withColumn("vote_ppm", TextQueries.qualityClfScoreExpr(
        col("text"), dense(model)))
      .withColumn("pred_keep",
        col("vote_ppm") >= TextQueries.QcKeepPpm)

  private def dense(model: Model): Seq[Long] =
    Seq.tabulate(TextQueries.QcB.toInt)(i =>
      model.rPpm.getOrElse(i.toLong, model.defaultPpm))
}
