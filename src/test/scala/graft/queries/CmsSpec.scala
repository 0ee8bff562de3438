package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch invariants under the width knob: the one-sided
  * guarantee (estimate never undercounts) at any width, and — because
  * width-w buckets are exact merges of width-W buckets for w < W
  * (both mask low bits of the same digest slice) — per-item estimates
  * are monotone: narrowing the sketch can only raise them.
  */
class CmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** word → (true_n, est_n) at the given sketch width. */
  private def run(width: Int): Map[String, (Long, Long)] = {
    spark.conf.set("graft.cms.width", width.toString)
    try {
      graft.SparkEntry.queries("tx_cms_topk")(spark, sf)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    } finally spark.conf.unset("graft.cms.width")
  }

  test("estimates never undercount, at default and narrow widths") {
    for (w <- Seq(1024, 64)) {
      run(w).foreach { case (wd, (t, e)) =>
        assert(e >= t, s"width $w undercounted '$wd': est $e < true $t")
      }
    }
  }

  test("narrowing the sketch is per-item monotone (bucket nesting)") {
    val wide = run(1024)
    val narrow = run(64)
    assert(wide.keySet === narrow.keySet)
    wide.foreach { case (wd, (_, eWide)) =>
      assert(narrow(wd)._2 >= eWide,
        s"'$wd': narrow est ${narrow(wd)._2} < wide est $eWide")
    }
  }

  test("non-power-of-two width is rejected loudly") {
    spark.conf.set("graft.cms.width", "1000")
    try {
      intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("tx_cms_topk")(spark, sf)
      }
    } finally spark.conf.unset("graft.cms.width")
  }
}
