package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** The GENERALIZING learned quality gate at ingest — the streaming
  * twin of the batch `tx_clf_struct` query (31st streaming operator).
  * `StreamingQualityClf` serves the hashed-bigram model, which
  * tx_clf_holdout showed memorizes on this corpus; this operator
  * serves the STRUCTURAL-feature model the same holdout split shows
  * actually generalizing (89.6% held-out at sf0.01 vs the 58% base
  * rate), so it is the twin a production ingest would gate on.
  *
  * Shape: stateless broadcast-model projection, Append mode,
  * trivially idempotent under at-least-once redelivery. The model is
  * ≤ ~70 (feature id → ratio ppm) rows no matter the corpus size,
  * learned batch-side from the oracled gate verdicts
  * ([[TextQueries.structFeaturesOf]] / [[TextQueries.structClfWeights]]
  * — the same derivation the batch query runs). Scoring computes the
  * five per-document metrics PER ROW (token count, type-token ratio,
  * stopword ratio, top-word share, duplicate-3-gram share), bins them
  * with the batch query's exact integer/floor arithmetic, and sums
  * the model's votes — all as ONE native
  * [[graft.functions.StructGateVotes]] call per row, no shuffle
  * (`StreamingStructClfSpec` pins bit-parity with the oracle-checked
  * batch scores; the expression's Scaladoc has the measured reason an
  * interpreted spelling was rejected).
  */
object StreamingStructClf {

  /** feature id -> keep/drop likelihood ratio (ppm), plus the
    * unseen-id default (the train model's nk=nd=0 ratio).
    */
  final case class Model(rPpm: Map[Long, Long], defaultPpm: Long)

  /** Learn from a (training) corpus frame with doc_id/text columns.
    * Driver materializes ≤ ~70 + 1 rows — model-sized, sanctioned.
    * NULL class totals (empty corpus) coalesce to 0: the default
    * degrades to (B)/(B) = even odds instead of an NPE.
    */
  def learn(corpus: DataFrame): Model = {
    val feat = TextQueries.structFeaturesOf(
      TextQueries.filterVerdictOf(corpus))
    val (wts, tots) = TextQueries.structClfWeights(feat)
    val m = wts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = tots.collect().head
    val tnk = if (t.isNullAt(0)) 0L else t.getLong(0)
    val tnd = if (t.isNullAt(1)) 0L else t.getLong(1)
    val b = TextQueries.QcStructB
    Model(m, ((tnd + b) * 1000000L) / (tnk + b))
  }

  /** Score a (batch or streaming) frame with a `text` column: adds
    * `vote_ppm` (the fraction, in ppm, of the five features in
    * keep-leaning ids) and `pred_keep` at [[TextQueries.QcKeepPpm]] —
    * the batch query's exact integers. Pure projection; the whole
    * per-row metric + bin + lookup loop is ONE native
    * [[graft.functions.StructGateVotes]] call (the model densified to
    * a 500-slot 0/1 vote table, unseen ids at the default's lean) —
    * the interpreted spelling measured 2.8k docs/s on the probe, the
    * per-distinct-token top-word HOF dominating.
    */
  def score(docs: DataFrame, model: Model): DataFrame = {
    val defVote = if (model.defaultPpm >= 1000000L) 1L else 0L
    val dense = Array.fill(500)(defVote)
    model.rPpm.foreach { case (k, r) =>
      if (k >= 0 && k < 500) dense(k.toInt) = if (r >= 1000000L) 1L else 0L
    }
    val votes =
      graft.functions.StructGateVotes(col("text"), dense.toSeq)
    // votes ∈ 0..5, so votes·1e6 div 5 == votes·200000 exactly — the
    // batch query's integer division without the div operator
    docs
      .withColumn("vote_ppm", votes * lit(200000L))
      .withColumn("pred_keep", col("vote_ppm") >= TextQueries.QcKeepPpm)
  }
}
