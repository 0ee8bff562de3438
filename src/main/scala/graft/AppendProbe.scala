package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.StagedIndex

/** Measures the appendable-stage contract end-to-end at real size:
  * copy a documents snapshot to a scratch dir, stage its shingle
  * index (FULL build), append ~10% more documents as new part files
  * (existing files untouched — the object-store ingest pattern), and
  * re-stage (DELTA build). The printed ratio is the O(delta) claim,
  * measured: the delta pass should cost ~a tenth of the full pass,
  * not another full derivation.
  *
  * `runMain graft.AppendProbe [baseDir] [baseRep]` prints:
  * `[append] rep=<f> full=<sec> rows=<n> / delta=<sec> rows=<n>`.
  *
  * `baseRep` (default 1) grows the BASE corpus ×f before staging —
  * per-replica rehashed words and offset ids (the ScaleProbe
  * discipline: replica content is distinct, so replicas never pair
  * with each other) — while the APPEND stays the same absolute slice
  * of the ×1 base. Delta time roughly flat in f ⇒ the delta pass is
  * decoupled from corpus size (the r10 verdict's question about the
  * pair spine's narrow signature-chain scan).
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val baseRep = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.local()
    GraftSession.applyEnvConf(spark)
    val work = java.nio.file.Files.createTempDirectory("graft_append")
      .toString
    val input = s"$work/documents.parquet"
    val docs = spark.read.parquet(s"$base/documents.parquet")
    def docRep(i: Int): DataFrame =
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).alias("doc_id"),
        regexp_replace(col("text"), "(^| )", s"$$1r${i}q").alias("text"),
        col("lang"), col("source"), col("n_chars"))
    (0 until baseRep).map(docRep).reduce(_ unionByName _)
      .write.parquet(input)
    spark.conf.set("graft.stage.dir", s"$work/stage")

    def build(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        graft.functions.WordShingles(col("text"), 3).alias("sh"))
    def pass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = StagedIndex
        .orStageAppendable(spark, "append_probe_sh3", work, input)(build)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // the DERIVED-JOIN artifact (r10): the LSH pair spine via
    // dd_minhash_lsh, whose lshAgreePairs stage is appendable-delta —
    // a full pass derives shingles + signatures + band self-join for
    // the whole corpus; the delta pass should band only the appended
    // docs against the corpus (plus the signature chain's own delta)
    def pairPass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.queries.DedupQueries.queries("dd_minhash_lsh")(
        spark, work).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val (fullSec, n0) = pass()
    val (pairFullSec, p0) = pairPass()
    // append a FIXED slice — every 10th doc of the ×1 BASE (replica
    // ids sit ≥ 1e6), re-id'd above every replica range, written as
    // NEW part files — so the delta's size is constant across
    // baseRep and the delta-vs-corpus-size question is isolated
    spark.read.parquet(input)
      .filter(col("doc_id") < 1000000L && col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L))
      .write.mode("append").parquet(input)
    StagedIndex.refreshTokens()
    val (deltaSec, n1) = pass()
    val (pairDeltaSec, p1) = pairPass()
    println(f"[append] rep=$baseRep full=$fullSec%.2f s rows=$n0 / " +
      f"delta=$deltaSec%.2f s rows=$n1")
    println(f"[append] rep=$baseRep pairs full=$pairFullSec%.2f s rows=$p0 / " +
      f"delta=$pairDeltaSec%.2f s rows=$p1")
    spark.stop()
  }
}
