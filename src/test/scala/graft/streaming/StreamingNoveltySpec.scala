package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.streaming.StreamingNovelty._

/** Pins the at-ingest Bloom novelty tracker: the one-sided error
  * bound against an exact per-shard first-seen recompute on the real
  * corpus, near-exactness on a roomy filter, verdict immutability
  * under redelivery, and state carried across micro-batches under
  * RocksDB.
  */
class StreamingNoveltySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** Distinct word-3-grams in first-occurrence order (the
    * WordShingles contract), hashed — the operator consumes hashes,
    * so the test only needs BOTH sides to use the same ones.
    */
  private def gramHashes(text: String): Array[Long] = {
    val words = text.split(" ", -1)
    if (words.length < 3) return Array.empty
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i + 3 <= words.length) {
      seen += words.slice(i, i + 3).mkString(" ")
      i += 1
    }
    seen.iterator
      .map(s => scala.util.hashing.MurmurHash3.stringHash(s).toLong *
        0x9E3779B97F4A7C15L)
      .toArray
  }

  private def corpusDocs(): Array[Doc] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), gramHashes(r.getString(2))))
      .sortBy(_.doc_id)

  test("streamed novelty is a lower bound on exact per-shard first-seen, " +
      "and near-exact on a roomy filter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = corpusDocs()

    // exact per-shard recompute, same replay order, same hashes
    val seen = mutable.Map.empty[String, mutable.Set[Long]]
    val exact = docs.map { d =>
      val s = seen.getOrElseUpdate(d.shard, mutable.Set.empty[Long])
      val nNew = d.grams.count(s.add)
      d.doc_id -> nNew.toLong
    }.toMap

    val in = MemoryStream[Doc]
    val q = score(in.toDS())
      .writeStream.format("memory").queryName("nov_bound")
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("nov_bound").as[Verdict].collect()
      assert(streamed.length === docs.length)
      streamed.foreach { v =>
        assert(v.n_new <= exact(v.doc_id),
          s"doc ${v.doc_id}: Bloom novelty overcounted — the one-sided " +
            "bound is broken")
        assert(v.novel_ppm ===
          (if (v.n_grams > 0) v.n_new * 1000000L / v.n_grams else 0L))
      }
      // the 2^17-bit filter is roomy for this corpus: aggregate loss
      // to false positives stays under 2%
      val exactTotal = exact.values.sum.toDouble
      val streamTotal = streamed.map(_.n_new).sum.toDouble
      assert(streamTotal >= exactTotal * 0.98,
        s"lost ${(1 - streamTotal / exactTotal) * 100}% to false positives")
    } finally q.stop()
  }

  test("cross-batch state: a gram seen in batch 1 is not new in batch 2; " +
      "redelivery emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = score(in.toDS())
      .writeStream.format("memory").queryName("nov_state")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, "en", Array(11L, 22L, 33L)))
      q.processAllAvailable()
      // 22 survives the batch boundary as "seen"; 44 is new
      in.addData(Doc(2L, "en", Array(22L, 44L)))
      q.processAllAvailable()
      val byId = spark.table("nov_state").as[Verdict].collect()
        .map(v => v.doc_id -> ((v.n_grams, v.n_new))).toMap
      assert(byId === Map(1L -> ((3L, 3L)), 2L -> ((2L, 1L))))
      // shards are independent filters: the same grams in another
      // shard are new again
      in.addData(Doc(3L, "de", Array(11L, 22L)))
      q.processAllAvailable()
      assert(spark.table("nov_state").as[Verdict].collect()
        .find(_.doc_id == 3L).get.n_new === 2L)
      // resume-token replay: nothing emitted, no bits set twice
      val rows = spark.table("nov_state").count()
      in.addData(Doc(2L, "en", Array(22L, 44L)))
      q.processAllAvailable()
      assert(spark.table("nov_state").count() === rows)
    } finally q.stop()
  }

  test("novelty state carries across micro-batches under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = score(in.toDS())
        .writeStream.format("memory").queryName("nov_rocks")
        .outputMode("append").start()
      try {
        in.addData(Doc(1L, "x", Array(7L))); q.processAllAvailable()
        in.addData(Doc(2L, "x", Array(7L, 8L))); q.processAllAvailable()
        val byId = spark.table("nov_rocks").as[Verdict].collect()
          .map(v => v.doc_id -> v.n_new).toMap
        assert(byId === Map(1L -> 1L, 2L -> 1L),
          "filter bits lost across RocksDB batch boundary")
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
