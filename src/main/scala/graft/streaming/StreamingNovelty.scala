package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Content novelty at ingest — the streaming twin of the batch
  * `tx_novelty` query, with the state bound every at-ingest
  * first-seen tracker needs: exact per-gram first-occurrence state is
  * O(distinct grams) (unbounded — at 100 TB it IS the corpus), so the
  * stream keeps a fixed-size BLOOM FILTER per shard instead and
  * accepts the filter's one-sided error: a false positive calls a
  * genuinely-new gram "seen", so the streamed novelty is a LOWER
  * bound on the batch novelty, never an overcount — the conservative
  * direction for a crawl-saturation stop signal (you stop crawling a
  * touch early, never too late). StreamingNoveltySpec pins the
  * one-sided bound against batch tx_novelty on the real corpus, and
  * exactness on a filter that is large relative to the inserted set.
  *
  * Two derived probe positions per gram (the classic two-hash Kirsch-
  * Mitzenmacher construction) over m = 2^FilterBitsLog2 bits; state
  * per shard is the bit array plus the applied doc_id high-water mark
  * (redelivered documents emit nothing and set no bits, so an
  * at-least-once ordered replay can never darken the filter twice or
  * flip a verdict).
  *
  * Emission is Append: one immutable (n_grams, n_new, novel_ppm) row
  * per NEW document — the same columns the batch query materializes.
  */
object StreamingNovelty {

  /** 2^17 bits = 16 KiB per shard: ~131k bits holds the sf0.001
    * corpus' ~50k distinct grams under 10% fill. Production sizes m
    * to the per-shard gram budget; the operator only assumes m is a
    * power of two.
    */
  val FilterBitsLog2 = 17

  case class Doc(doc_id: Long, shard: String, grams: Array[Long])
  case class Verdict(doc_id: Long, shard: String, n_grams: Long,
    n_new: Long, novel_ppm: Long)
  case class NovState(bits: Array[Byte], maxDocId: Long)

  private def mask: Int = (1 << FilterBitsLog2) - 1

  private def probe1(h: Long): Int = (h & mask).toInt
  // odd multiplier mix for the second probe — independent enough for
  // the one-sided bound (exactness is NOT claimed, only tested on a
  // roomy filter)
  private def probe2(h: Long): Int =
    (((h * 0x9E3779B97F4A7C15L) >>> 23) & mask).toInt

  private def get(bits: Array[Byte], i: Int): Boolean =
    (bits(i >>> 3) & (1 << (i & 7))) != 0

  private def set(bits: Array[Byte], i: Int): Unit =
    bits(i >>> 3) = (bits(i >>> 3) | (1 << (i & 7))).toByte

  def score(docs: Dataset[Doc]): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: String, it: Iterator[Doc], state: GroupState[NovState]) =>
          val sorted = it.toArray.sortBy(_.doc_id)
          var st = state.getOption.getOrElse(
            NovState(new Array[Byte](1 << (FilterBitsLog2 - 3)),
              Long.MinValue))
          val out = Vector.newBuilder[Verdict]
          for (d <- sorted if d.doc_id > st.maxDocId) {
            var nNew = 0L
            for (g <- d.grams) {
              val (i1, i2) = (probe1(g), probe2(g))
              if (!(get(st.bits, i1) && get(st.bits, i2))) {
                nNew += 1L
                set(st.bits, i1); set(st.bits, i2)
              }
            }
            val n = d.grams.length.toLong
            val ppm = if (n > 0) nNew * 1000000L / n else 0L
            out += Verdict(d.doc_id, shard, n, nNew, ppm)
            st = NovState(st.bits, d.doc_id)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
