package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline as verifiable queries: the binary decode path
  * runs through the real typed mapPartitions plumbing with the
  * deterministic stub codec, so the whole chain (binary column →
  * decoder → features / frames) has an exact SQL oracle.
  */
object MultimodalQueries {

  /** Session-selected codec (`graft.media.decoder`, default stub —
    * the oracle replays the stub's arithmetic; a deployment with real
    * image payloads sets `imageio`).
    */
  private def decoder(s: SparkSession): Multimodal.MediaDecoder =
    Multimodal.decoderFor(s.conf.get("graft.media.decoder", "stub"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.asMedia(s, Tables.documents(s, d)),
        decoder(s))
        .toDF()
        .orderBy("media_id")),

    "mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.asMedia(s, Tables.documents(s, d)),
        chunkBytes = 32, stride = 2)
        .toDF()
        .orderBy("media_id", "frame_no")),

    "mm_resize" -> ((s, d) =>
      Multimodal.resize(
        Multimodal.asMedia(s, Tables.documents(s, d)),
        stride = 4, decoder(s))
        .toDF()
        .orderBy("media_id")))

  private val fpSql = (e: String) =>
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split($e, ''),
       |        x -> CAST(ascii(x) AS BIGINT))),
       |    (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_features" ->
      s"""SELECT doc_id AS media_id,
         |  'img/' || source AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  ${fpSql("text")} AS fp,
         |  CAST(1 + ascii(substr(text, 1, 1)) % 64 AS BIGINT) AS width,
         |  CAST(1 + ascii(substr(text, 2, 1)) % 64 AS BIGINT) AS height
         |FROM documents ORDER BY media_id""".stripMargin,

    "mm_frames" ->
      s"""WITH chunks AS (
         |  SELECT doc_id AS media_id,
         |    CAST(i - 1 AS BIGINT) AS frame_no,
         |    substr(text, (i - 1) * 32 + 1, 32) AS chunk
         |  FROM documents,
         |    UNNEST(range(1, CAST(ceil(length(text) / 32.0) AS BIGINT) + 1))
         |      t(i))
         |SELECT media_id, frame_no,
         |  CAST(length(chunk) AS BIGINT) AS n_bytes,
         |  ${fpSql("chunk")} AS fp
         |FROM chunks WHERE frame_no % 2 = 0
         |ORDER BY media_id, frame_no""".stripMargin,

    // every 4th char of the payload, re-featured (ASCII corpus ⇒
    // byte positions == char positions)
    "mm_resize" ->
      s"""WITH resized AS (
         |  SELECT doc_id AS media_id,
         |    CAST(length(text) AS BIGINT) AS orig_bytes,
         |    array_to_string(
         |      [substr(text, (i - 1) * 4 + 1, 1)
         |       for i in range(1, CAST(ceil(length(text) / 4.0) AS BIGINT) + 1)],
         |      '') AS r
         |  FROM documents)
         |SELECT media_id, orig_bytes,
         |  CAST(length(r) AS BIGINT) AS resized_bytes,
         |  ${fpSql("r")} AS fp,
         |  CAST(1 + ascii(substr(r, 1, 1)) % 64 AS BIGINT) AS width,
         |  CAST(1 + ascii(substr(r, 2, 1)) % 64 AS BIGINT) AS height
         |FROM resized ORDER BY media_id""".stripMargin)
}
