package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequence packing at ingest — the streaming twin of the batch
  * `tx_pack` query (head-to-tail concatenation of the token stream
  * per language shard, cut at fixed PackLen boundaries). Batch
  * computes every document's (bin, offset) from a GroupRank running
  * sum over the finished corpus; the stream maintains the SAME
  * running sum as keyed state, so a document admitted at ingest lands
  * in EXACTLY the bin and offset the batch layout would give it —
  * packing is next-fit in the corpus total order (doc_id), which a
  * prefix of the stream determines without seeing the future. The
  * parity is pinned by StreamingPackSpec against `packOf` on the real
  * testdata corpus.
  *
  * State per language is two longs (the running token total + the
  * applied doc_id high-water mark), O(langs) total — the bounded-
  * dimension state class of StreamingSourceCap. Documents at or below
  * the high-water mark emit nothing, so at-least-once redelivery of
  * an ordered replay (the reference's resume_after semantics,
  * `change_stream_reading/watch.py:86-91`) can neither advance the
  * layout twice nor move a document between bins.
  *
  * Emission is Append: one immutable placement row per NEW document —
  * the shard-layout log a downstream packer materializes batches
  * from.
  */
object StreamingPack {

  case class Doc(doc_id: Long, lang: String, n_tokens: Long)
  case class Placement(doc_id: Long, lang: String, n_tokens: Long,
    bin: Long, offset: Long)
  case class PackState(run: Long, maxDocId: Long)

  def pack(docs: Dataset[Doc], packLen: Long): Dataset[Placement] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[Doc], state: GroupState[PackState]) =>
          // place in stream order (doc_id is the corpus total order):
          // within a batch the earliest ids extend the layout first
          val sorted = it.toArray.sortBy(_.doc_id)
          var st = state.getOption.getOrElse(PackState(0L, Long.MinValue))
          val out = Vector.newBuilder[Placement]
          for (d <- sorted if d.doc_id > st.maxDocId) {
            val start = st.run // prefix sum BEFORE this doc
            st = PackState(st.run + d.n_tokens, d.doc_id)
            out += Placement(d.doc_id, lang, d.n_tokens,
              start / packLen, start % packLen)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
