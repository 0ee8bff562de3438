package graft

/** Ad-hoc per-query timing: `runMain graft.Profile <sfDir> q1 q2 ...`
  * times each named SparkEntry query (noop sink, N passes), printing
  * one line per pass — the narrow-scope companion to Bench for
  * iterating on a single slow query without a full 36-query sweep.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = GraftSession.local()
    GraftSession.applyEnvConf(spark)

    for (name <- names; pass <- 1 to passes) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name pass $pass: $sec%.2f s")
    }
    spark.stop()
  }
}
