package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Debug tool: dump one plan-shape line per query (or the full
  * formatted plan for a single named query). Run with
  * `sbt "Test/runMain graft.tools.PlanProbe [sfDir] [queryName]"`.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1)
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((n, f) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_ == n)) {
      try {
        val df = f(spark, sf)
        if (args.lift(2).contains("exec")) df.collect()
        val p = df.queryExecution.explainString(FormattedMode)
        if (only.isDefined) println(p)
        else println(s"PROBE $n wgl=${p.contains("WindowGroupLimit")}" +
          s" bex=${p.contains("BroadcastExchange")}" +
          s" win=${p.contains("Window")}")
      } catch { case e: Throwable =>
        println(s"PROBE $n ERR ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
