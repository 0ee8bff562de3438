package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (debug subset runs;
    // the driver always runs the full surface)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The DuckDB oracles replay the DEFAULT knob values (CMS width,
    // PQ shortlist, k-means cells, IVF probes, media decoder are
    // baked into the SQL text). Running the dump with a tuned knob
    // would produce false oracle mismatches, so refuse loudly instead
    // of letting the round's correctness silently zero.
    val oracleCoupledKnobs = Map(
      "graft.cms.width" -> graft.queries.TextQueries.CmsWidth.toString,
      "graft.bpe.merges" -> graft.queries.TextQueries.BpeMerges.toString,
      "graft.dedup.maxShingleDf" ->
        graft.queries.DedupQueries.DefaultMaxShingleDf.toString,
      "graft.text.boilerplateDf" ->
        graft.queries.TextQueries.BoilerplateDf.toString,
      "graft.pq.shortlist" -> "50",
      "graft.sq8.shortlist" ->
        graft.queries.SimilarityQueries.Sq8Shortlist.toString,
      "graft.mrl.shortlist" ->
        graft.queries.SimilarityQueries.MrlShortlist.toString,
      "graft.kmeans.cells" -> graft.queries.SimilarityQueries.NCentroids.toString,
      "graft.lsh.planes" -> graft.queries.SimilarityQueries.NPlanes.toString,
      "graft.ivf.probes" -> "2",
      "graft.media.decoder" -> "stub")
    oracleCoupledKnobs.foreach { case (k, default) =>
      val v = spark.conf.get(k, default)
      require(v == default,
        s"$k=$v but the DuckDB oracles replay the default ($default); " +
          "unset it for verification runs")
      // pin explicitly: lsh.planes / kmeans.cells derive their UNSET
      // default from the corpus count, and verification must replay
      // the oracle constants regardless of corpus size
      spark.conf.set(k, default)
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
