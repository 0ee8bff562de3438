package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeEventRow, EnvelopeTransform, Ns, ResumeToken}
import graft.sources.ChangeEventReplaySource
import graft.streaming.StreamingSnapshot.{Change, SnapRow}

/** The end-to-end demo the README promises — "CDC in, curated corpus
  * out" — as one spec over the real streaming runtime:
  *
  *   graft-replay source (S1-S6 semantics)
  *     → EnvelopeTransform (F1 filter + P1/P2/P3 envelope)
  *     → StreamingSnapshot (last-writer-wins materialization)
  *     → file "topic" (idempotent-by-batchId parquet, the
  *       FileTopicSink pattern — the Kafka handoff without a broker)
  *     → StreamingNearDup (dedup-at-ingest over the live corpus)
  *
  * with BOTH queries killed and restarted from their checkpoints in
  * the middle of the stream, and all keyed state under the RocksDB
  * (spillable) provider. Proves across the restart:
  *
  *  - **no loss**: the final materialized snapshot equals a batch
  *    last-writer-wins recomputation over every change event —
  *    including events delivered only after the restart;
  *  - **no duplicated verdict**: each near-dup pair is emitted exactly
  *    once, even though the pair's two documents arrive on opposite
  *    sides of the restart (the LSH bucket state and the file-source
  *    seen-files log both have to survive the checkpoint round-trip).
  */
class CdcCurationCapstoneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog and runs far away now"
  private val unrelatedA =
    "completely different words about spark structured streaming state stores"
  private val unrelatedB =
    "parquet files hold columnar data with statistics for predicate pruning"
  private val doomed =
    "this document exists only to be deleted before the curated corpus ships"

  private def ev(seq: Long, op: String, k: Long, text: String,
      cents: Long): ChangeEventRow = {
    val oid = f"$k%024x"
    val doc =
      if (op == "delete") None
      else Some(s"""{"_id": {"$$oid": "$oid"}, "k": $k, """ +
        s""""text": "$text", "cents": $cents}""")
    ChangeEventRow(
      ResumeToken(f"tok$seq%04d"), op,
      new Timestamp(seq), new Timestamp(seq),
      Ns("corpus", "documents"),
      Some(s"""{"_id": {"$$oid": "$oid"}, "k": $k}"""),
      doc, None, None)
  }

  // events 0-4 arrive before the kill, 5-9 only after the restart;
  // the near-dup pair (1, 4) straddles it, as does k=3's delete and
  // k=2's value-only update
  private val beforeKill = Seq(
    ev(0L, "insert", 1L, base, 100L),
    ev(1L, "insert", 2L, unrelatedA, 200L),
    ev(2L, "insert", 3L, doomed, 300L),
    ev(3L, "drop", 3L, "", 0L), // non-data op: filtered, offset advances
    ev(4L, "update", 2L, unrelatedA, 250L))
  private val afterRestart = Seq(
    ev(5L, "insert", 4L, nearDup, 400L),
    ev(6L, "delete", 3L, "", 0L),
    ev(7L, "insert", 5L, unrelatedB, 500L),
    ev(8L, "replace", 5L, unrelatedB, 550L),
    ev(9L, "invalidate", 0L, "", 0L)) // filtered, offset advances

  /** Stage 1: replay source → envelope → snapshot. The S6 sequence
    * (clusterTime millis — the replay fixture's total order) rides
    * alongside the envelope triple the way a Kafka consumer reads the
    * partition offset next to the message.
    */
  private def stage1(opts: Map[String, String], ckpt: String,
      topicDir: String) = {
    val events = spark.readStream.format("graft-replay").options(opts)
      .option("maxRowsPerBatch", "2").load()
    val env = EnvelopeTransform.filterDataOps(events).select(
      EnvelopeTransform.topic("cdc").alias("topic"),
      col("documentKey").alias("key"),
      EnvelopeTransform.valueEnvelope.alias("value"),
      unix_millis(col("clusterTime")).alias("seq"))
    import spark.implicits._
    val changes = env.select(
      get_json_object(col("key"), "$.k").cast(LongType).alias("key"),
      col("seq").alias("eventId"),
      get_json_object(col("value"), "$.op").alias("op"),
      coalesce(get_json_object(col("value"), "$.after.text"), lit(""))
        .alias("doc"),
      coalesce(get_json_object(col("value"), "$.after.cents").cast(LongType),
        lit(0L)).alias("cents")).as[Change]
    StreamingSnapshot(changes)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SnapRow], id: Long) =>
        // idempotent by batchId: a replayed batch finds its _SUCCESS
        // marker and writes nothing, so the downstream file source
        // never sees duplicate files under new names
        val dir = new java.io.File(topicDir, s"batch_$id")
        if (!new java.io.File(dir, "_SUCCESS").exists())
          b.write.mode("overwrite").parquet(dir.toString)
      }
      .start()
  }

  /** Stage 2: file "topic" → live docs → streaming near-dup. */
  private def stage2(topicDir: String, ckpt: String,
      pairs: ConcurrentHashMap[(Long, Long), Integer]) = {
    import spark.implicits._
    val snap = spark.readStream
      .schema(Encoders.product[SnapRow].schema)
      .option("recursiveFileLookup", "true")
      .parquet(topicDir)
    val docs = snap.filter(col("live"))
      .select(col("key").alias("doc_id"), col("doc").alias("text"))
      .as[StreamingNearDup.Doc]
    StreamingNearDup.candidatePairs(docs, minAgree = 16, maxPerBucket = 8,
        bucketTtl = None)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingNearDup.Pair],
          _: Long) =>
        b.collect().foreach { p =>
          pairs.merge((p.ida, p.idb), Integer.valueOf(1), (a, x) =>
            Integer.valueOf(a.intValue() + x.intValue()))
        }
      }
      .start()
  }

  test("CDC in, curated corpus out — no loss, no duplicate verdicts " +
      "across a mid-stream kill/restart under RocksDB") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try {
      val topicDir = java.nio.file.Files
        .createTempDirectory("capstone_topic").toString
      val ckptA = java.nio.file.Files
        .createTempDirectory("capstone_ckpt_a").toString
      val ckptB = java.nio.file.Files
        .createTempDirectory("capstone_ckpt_b").toString
      val pairs = new ConcurrentHashMap[(Long, Long), Integer]()
      val fixture = "capstone-fixture"

      // ---- phase 1: the first half of the stream ----
      var opts = ChangeEventReplaySource.register(fixture, beforeKill)
      var qa = stage1(opts, ckptA, topicDir)
      var qb = stage2(topicDir, ckptB, pairs)
      try {
        qa.processAllAvailable()
        qb.processAllAvailable()
      } finally { qa.stop(); qb.stop() } // the kill

      assert(pairs.isEmpty, s"no near-dup pair exists yet: $pairs")

      // ---- phase 2: restart both from their checkpoints; the full
      // fixture now extends past the committed offsets ----
      ChangeEventReplaySource.unregister(fixture)
      opts = ChangeEventReplaySource
        .register(fixture, beforeKill ++ afterRestart)
      qa = stage1(opts, ckptA, topicDir)
      qb = stage2(topicDir, ckptB, pairs)
      try {
        qa.processAllAvailable()
        qb.processAllAvailable()

        // -- no loss: materialized snapshot == batch recomputation --
        val emitted = spark.read
          .schema(Encoders.product[SnapRow].schema)
          .option("recursiveFileLookup", "true").parquet(topicDir)
        val got = emitted.collect().map(r => (r.getLong(0), r.getLong(1),
            r.getString(2), r.getString(3), r.getLong(4), r.getBoolean(5)))
          .groupBy(_._1)
          .map { case (k, rows) => k -> rows.maxBy(_._2) }
          .filter(_._2._6)
          .map { case (k, (_, _, _, doc, cents, _)) => k -> ((doc, cents)) }
        val expect = Map(
          1L -> ((base, 100L)),
          2L -> ((unrelatedA, 250L)),
          4L -> ((nearDup, 400L)),
          5L -> ((unrelatedB, 550L))) // k=3 deleted
        assert(got === expect, "snapshot diverged from batch recomputation")

        // -- no duplicate verdicts: the straddling pair exactly once --
        import scala.jdk.CollectionConverters._
        assert(pairs.asScala.toMap.map { case (k, v) => k -> v.intValue() }
          === Map((1L, 4L) -> 1),
          s"pair verdicts wrong or duplicated: $pairs")
      } finally {
        qa.stop(); qb.stop()
        ChangeEventReplaySource.unregister(fixture)
      }
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
