package graft

/** Plan inspector: prints the formatted physical plan (and optionally
  * runs) the named queries against a sf dir. Usage:
  *   runMain graft.Explain <sfDir> <query1> [query2 ...]
  * Add "--run" to also execute (noop sink) and print wall time.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val run = args.contains("--run")
    val rest = args.filterNot(_ == "--run")
    val sfDir = rest.head
    val names = if (rest.tail.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else rest.tail.toSeq
    val spark = GraftSession.local()
    names.foreach { n =>
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (run) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[explain] $n ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
