package graft.sinks

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Pins the export layout contract: partition directories, bounded
  * shard sizes, within-file ordering, exact content round-trip, and
  * the one-writer-per-partition-value file count (the small-files
  * guard).
  */
class DatasetExporterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq

  test("export writes pruned partition dirs, bounded sorted shards, " +
      "and round-trips exactly") {
    val out = Files.createTempDirectory("graft_export").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

    DatasetExporter.export(docs, out,
      partitionCol = "lang", orderCols = Seq("n_chars", "doc_id"),
      maxRecordsPerFile = 20L)

    // one directory per language, loader-prunable by path
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    for (l <- langs)
      assert(Files.isDirectory(Paths.get(s"$out/lang=$l")), s"missing dir $l")

    // every shard respects the record cap, and rows inside one file
    // follow the (n_chars, doc_id) curriculum order
    for (f <- parquetFiles(out)) {
      val rows = spark.read.parquet(f.toString)
        .select("n_chars", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length <= 20, s"$f exceeds maxRecordsPerFile: ${rows.length}")
      assert(rows.sameElements(rows.sortBy(identity)),
        s"$f not in curriculum order")
    }

    // exact content round-trip (partition column comes back from the path)
    val back = spark.read.parquet(out)
      .select("doc_id", "lang", "source", "n_chars")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "round-trip content mismatch")

    // the small-files guard: each language's shard count is
    // ceil(rows/cap), not O(shuffle partitions)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, n) <- perLang) {
      val files = parquetFiles(s"$out/lang=$l").length
      val want = ((n + 19) / 20).toInt
      assert(files === want,
        s"lang=$l: $files files for $n rows (cap 20, want $want)")
    }
  }

  test("hot-partition salting spreads one value over several writers " +
      "without leaking rows across directories") {
    val out = Files.createTempDirectory("graft_export_salt").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))

    DatasetExporter.export(docs, out,
      partitionCol = "lang", orderCols = Seq("doc_id"),
      maxRecordsPerFile = 1000L, tasksPerPartitionValue = 3)

    val back = spark.read.parquet(out).select("doc_id", "lang", "n_chars")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "salted export changed content")
    // salting may split a language into up to 3 files, never more
    val perLang = docs.select("lang").distinct().collect().map(_.getString(0))
    for (l <- perLang) {
      val files = parquetFiles(s"$out/lang=$l").length
      assert(files >= 1 && files <= 3, s"lang=$l: $files writer files")
    }
  }
}
