package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.queries.DedupQueries.{Bands, RowsPerBand}
import graft.streaming.StreamingNearDup.{banded, Doc}

/** Dedup-at-ingest against an EXISTING corpus — the streaming twin of
  * the batch `dd_cross_dedup` near tier: as new documents stream in,
  * each is MinHash-banded and joined against the static band index of
  * the already-curated corpus; signature agreement ≥ `minAgree` flags
  * the arrival as a near-duplicate of a corpus document.
  *
  * Where `StreamingNearDup` finds duplicates WITHIN the stream
  * (stateful bucket memory), this finds duplicates AGAINST the corpus
  * with a stream-static equi-join — completely stateless on the
  * stream side, so there is no TTL/eviction tradeoff at all: the
  * "state" is the corpus index, computed once per snapshot (the
  * StagedIndex pattern — at 100 TB the index is a parquet table one
  * band-row per (corpus doc, band), hash-partitioned by exactly the
  * (band, key) the join needs).
  *
  * Once-per-pair emission is stateless too: a pair colliding in
  * several bands is emitted only by its minimum agreeing band, which
  * every colliding band computes identically from the two signatures
  * (no coordination, no dedup state) — same discipline as
  * `StreamingNearDup.minSharedBand`, expressed as a Column over the
  * banded signatures.
  *
  * Same hash math as `dd_minhash_lsh`/`dd_cross_dedup` and their
  * DuckDB oracles (the spec pins stream-vs-batch signature parity via
  * StreamingNearDup.signature).
  */
object StreamingCrossDedup {

  /** The static side: one row per (band, key, corpus doc) with the
    * full signature — derived from a `documents`-shaped frame with
    * the SAME per-row signing as the stream side. Stage this once per
    * corpus snapshot and read it back hash-partitioned.
    */
  def corpusIndex(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    banded(docs.select(col("doc_id").cast(LongType), col("text")).as[Doc])
      .toDF()
      .withColumnRenamed("doc_id", "corpus_id")
      .withColumnRenamed("sig", "csig")
  }

  /** stream docs → (doc_id, corpus_id, agree) rows, one per
    * near-duplicate (arrival, corpus doc) pair with agreement ≥
    * `minAgree`; each pair emitted exactly once regardless of how
    * many bands it collides in.
    */
  def matches(stream: Dataset[Doc], index: DataFrame,
      minAgree: Int = 16): DataFrame = {
    val arrivals = banded(stream).toDF()
    // per-band full-agreement flags — band b agrees iff its RowsPerBand
    // signature slice matches, which is exactly the band-key equality
    // that produced the join hit, so position 1 is always populated
    val bandAgrees = array((0 until Bands).map(b =>
      slice(col("sig"), b * RowsPerBand + 1, RowsPerBand) ===
        slice(col("csig"), b * RowsPerBand + 1, RowsPerBand)): _*)
    arrivals.join(index, Seq("band", "key")) // stream-static equi-join
      .filter(col("doc_id") =!= col("corpus_id"))
      .withColumn("agree",
        size(filter(zip_with(col("sig"), col("csig"),
          (x, y) => x === y), b => b)).cast(LongType))
      .filter(col("agree") >= minAgree)
      // stateless once-per-pair: only the minimum agreeing band emits
      .filter(col("band") === array_position(bandAgrees, lit(true)) - 1)
      .select(col("doc_id"), col("corpus_id"), col("agree"))
  }
}
