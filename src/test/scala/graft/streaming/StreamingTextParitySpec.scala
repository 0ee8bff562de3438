package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.queries.TextQueries

/** The per-row quality gate lifts to the streaming runtime unchanged:
  * `TextQueries.gopherRules` is a pure transform, so running it over
  * a file STREAM of the documents table must produce bit-identical
  * verdicts to the batch query — the property a dedup-at-ingest
  * pipeline (change stream → quality gate → near-dup) silently
  * assumes. Pinned here so a future edit that sneaks a
  * batch-only construct (a window, an orderBy, a non-deterministic
  * expression) into the transform fails loudly.
  */
class StreamingTextParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("gopherRules on a document stream equals the batch verdicts") {
    val batch = TextQueries.gopherRules(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    // the file stream source wants a directory; the testdata table is
    // a single parquet file, so stage it into one
    val dir = java.nio.file.Files.createTempDirectory("gopher_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = Tables.documents(spark, sf).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = TextQueries.gopherRules(stream)
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gopher_stream")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(streamed.size === batch.size, "row counts diverged")
      batch.foreach { case (id, row) =>
        assert(streamed(id) === row, s"doc $id verdict diverged on stream")
      }
    } finally q.stop()
  }

  test("readabilityOf on a document stream equals the batch scores") {
    val batch = TextQueries.readabilityOf(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    val dir = java.nio.file.Files.createTempDirectory("read_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = Tables.documents(spark, sf).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = TextQueries.readabilityOf(stream)
      .writeStream.format("memory").queryName("read_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("read_stream")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(streamed.size === batch.size, "row counts diverged")
      batch.foreach { case (id, row) =>
        assert(streamed(id) === row, s"doc $id score diverged on stream")
      }
    } finally q.stop()
  }
}
