package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnomaly._

class StreamingAnomalySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  test("zOf: cold start, zero variance, and exact z arithmetic") {
    // below minN → no score, regardless of how extreme the value is
    assert(zOf(Moments(9, 9000, 9000000), 1000000, minN = 10).isEmpty)
    // zero variance (all observations identical) → no score
    val flat = Moments(100, 100 * 50, 100 * 50 * 50)
    assert(zOf(flat, 1000, minN = 10).isEmpty)
    // mean 0, values ±100 → sd 100; z(300) = 3 exactly
    val sym = Moments(100, 0, 100 * 100 * 100)
    assert(zOf(sym, 300, minN = 10).contains(3.0))
    assert(zOf(sym, -300, minN = 10).contains(-3.0))
  }

  test("outliers flag against PRE-batch moments; normals stay silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = detect(in.toDS(), zThresh = 3.0, minN = 50, idleTtl = None)
      .writeStream.format("memory").queryName("an_out")
      .outputMode("append").start()
    try {
      // batch 1: 100 baseline observations, values alternate 0/100
      // around mean 50 (sd 50) — PLUS one wild value that must NOT
      // flag because the key is still cold (n = 0 < minN when scored)
      val base = (1L to 100L).map(i =>
        Obs(i, "pay", if (i % 2 == 0) 0L else 100L))
      in.addData(base :+ Obs(999L, "pay", 100000L): _*)
      q.processAllAvailable()
      val afterCold = spark.table("an_out").as[Anomaly].collect()
      assert(afterCold.isEmpty, s"cold-start flagged: ${afterCold.toSeq}")

      // batch 2: normals within 1 sd stay silent; an extreme value
      // flags. Baseline now includes batch 1's wild value — its z
      // against the polluted-but-wide baseline is still computed from
      // exact integer moments.
      in.addData(Obs(200L, "pay", 60L), Obs(201L, "pay", 40L))
      q.processAllAvailable()
      assert(spark.table("an_out").as[Anomaly].collect().isEmpty,
        "in-band values must not flag")

      in.addData(Obs(300L, "pay", 500000L))
      q.processAllAvailable()
      val flagged = spark.table("an_out").as[Anomaly].collect()
      assert(flagged.map(_.obsId).toSeq == Seq(300L))
      assert(flagged.head.z > 3.0)

      // an unseen key is cold regardless of other keys' history
      in.addData(Obs(400L, "refund", 500000L))
      q.processAllAvailable()
      assert(!spark.table("an_out").as[Anomaly].collect()
        .exists(_.key == "refund"), "per-key cold start must isolate keys")
    } finally q.stop()
  }

  test("a batch of simultaneous outliers cannot drag the baseline " +
      "toward itself before being judged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = detect(in.toDS(), zThresh = 3.0, minN = 50, idleTtl = None)
      .writeStream.format("memory").queryName("an_flood")
      .outputMode("append").start()
    try {
      in.addData((1L to 100L).map(i =>
        Obs(i, "m", if (i % 2 == 0) 0L else 100L)): _*)
      q.processAllAvailable()
      // 20 identical extreme values arrive at once: scored against
      // the pre-batch mean 50 / sd 50, ALL must flag (an in-batch
      // running update would let the flood normalize itself)
      in.addData((201L to 220L).map(i => Obs(i, "m", 10000L)): _*)
      q.processAllAvailable()
      val flagged = spark.table("an_flood").as[Anomaly].collect()
      assert(flagged.map(_.obsId).sorted.toSeq == (201L to 220L),
        s"flood must flag wholesale, got ${flagged.map(_.obsId).toSeq}")
    } finally q.stop()
  }
}
