package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Fixed-budget uniform corpus sample maintained at ingest — the
  * streaming relative of the batch hash-ranked samplers (tx_sample /
  * tx_sample_weighted): per language keep the K documents with the
  * SMALLEST (hash, doc_id) keys seen so far. Because the hash plays
  * the PRNG, bottom-K-by-hash IS a uniform K-sample of whatever
  * prefix has arrived — the classic bottom-k sketch — and unlike the
  * batch 10%-quota sampler its state is bounded: K keys per
  * language, forever, no matter the corpus size.
  *
  * The sample is emitted as a CHANGELOG (Append mode): an `add` row
  * when a document enters the sample, an `evict` row when a better
  * key pushes it out. A downstream materializer (adds minus evicts)
  * holds, after any prefix, EXACTLY the batch bottom-K of that
  * prefix — StreamingSampleSpec pins this equivalence on the real
  * corpus, plus single-add/single-evict discipline, no-op
  * redelivery (doc_id high-water), and RocksDB state carry.
  *
  * This is also why the changelog shape matters: a sample that only
  * ever ADDS cannot stay uniform as the corpus grows — eviction is
  * what keeps each survivor's inclusion probability equal.
  */
object StreamingSample {

  case class Doc(doc_id: Long, lang: String, h: Long)
  case class Change(doc_id: Long, lang: String, h: Long, action: String)
  /** Parallel arrays sorted by (h, id) ascending; O(K) longs. */
  case class SampState(hs: Array[Long], ids: Array[Long], maxDocId: Long)

  private def ltKey(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 < h2 || (h1 == h2 && i1 < i2)

  def sample(docs: Dataset[Doc], k: Int): Dataset[Change] = {
    require(k >= 1, "sample budget must be >= 1")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[Doc], state: GroupState[SampState]) =>
          val sorted = it.toArray.sortBy(_.doc_id)
          var st = state.getOption.getOrElse(
            SampState(Array.empty, Array.empty, Long.MinValue))
          // mutable working copy of the sorted key set
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var bi = 0
          while (bi < st.hs.length) { buf += ((st.hs(bi), st.ids(bi))); bi += 1 }
          val out = Vector.newBuilder[Change]
          var hw = st.maxDocId
          for (d <- sorted if d.doc_id > hw) {
            hw = d.doc_id
            val full = buf.length >= k
            val worst = if (buf.nonEmpty) buf.last else (0L, 0L)
            if (!full || ltKey(d.h, d.doc_id, worst._1, worst._2)) {
              if (full) {
                out += Change(worst._2, lang, worst._1, "evict")
                buf.remove(buf.length - 1)
              }
              // insertion keeping (h, id) order
              val at = buf.indexWhere(p => ltKey(d.h, d.doc_id, p._1, p._2))
              if (at < 0) buf += ((d.h, d.doc_id))
              else buf.insert(at, (d.h, d.doc_id))
              out += Change(d.doc_id, lang, d.h, "add")
            }
          }
          state.update(SampState(buf.map(_._1).toArray,
            buf.map(_._2).toArray, hw))
          out.result().iterator
      }
  }
}
