package graft

/** Local twin of the driver's smoke check: run SparkEntry.entry and
  * print the row count plus a couple of sample envelopes.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val df = SparkEntry.entry(spark)
    val rows = df.count()
    println(s"[smoke] entry rows=$rows")
    df.show(3, truncate = false)
    require(rows > 0, "entry must return rows")
    spark.stop()
  }
}
