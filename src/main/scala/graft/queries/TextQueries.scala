package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fingerprint

/** Text-analysis operators over the `documents` table (training-data
  * pipeline surface). All per-document — embarrassingly parallel, no
  * shuffle; the fingerprint is a codegen Catalyst expression.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rolling-hash document fingerprint (custom codegen expression).
    "tx_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Fingerprint(col("text")).alias("fp"))
        .orderBy("doc_id")))

  val oracles: Map[String, String] = Map(
    // Same fold, same constants: h = (h*31 + byte) % 1e9+7 over the
    // (ASCII) text. list_reduce seeds with the prepended 0.
    "tx_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''),
        |        x -> CAST(ascii(x) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)
}
