package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gate for the SQ8 pipeline: recall@k of the integer-dot
  * shortlist + exact rerank against the brute-force top-k. Unlike PQ
  * (3-bit codebooks, lossy by construction), per-dim 8-bit affine
  * codes preserve most of the dot-product ordering even on
  * cluster-free synthetic embeddings, so the floor is higher; the
  * contract is the same — monotone in shortlist width, exact when the
  * shortlist covers the corpus.
  */
class Sq8RecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** qid → recall@TopK of sim_sq8_ann vs sim_cosine_topk. */
  private def recalls(shortlist: Int): Map[Long, Double] = {
    spark.conf.set("graft.sq8.shortlist", shortlist.toString)
    try {
      val exact = graft.SparkEntry.queries("sim_cosine_topk")(spark, sf)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val approx = graft.SparkEntry.queries("sim_sq8_ann")(spark, sf)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, e) =>
        qid -> approx.get(qid).map(a => (e & a).size.toDouble / e.size)
          .getOrElse(0.0)
      }
    } finally spark.conf.unset("graft.sq8.shortlist")
  }

  test("mean recall@10 >= 0.8 at the default 50-wide shortlist") {
    val r = recalls(SimilarityQueries.Sq8Shortlist)
    assert(r.size === SimilarityQueries.NQueries)
    val mean = r.values.sum / r.size
    assert(mean >= 0.8, s"mean SQ8 recall degraded: $mean ($r)")
  }

  test("recall is monotone in shortlist width (50 -> 100)") {
    val r50 = recalls(50)
    val r100 = recalls(100)
    r50.foreach { case (qid, rec) =>
      assert(r100(qid) >= rec,
        s"shortlist widening lost recall for qid=$qid: $rec -> ${r100(qid)}")
    }
  }

  test("a corpus-wide shortlist recovers brute force exactly") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count().toInt
    recalls(n).foreach { case (qid, rec) =>
      assert(rec === 1.0, s"qid=$qid recall $rec with full shortlist")
    }
  }

  test("knob validation rejects zero and absurd widths") {
    for (bad <- Seq("0", "-5", (1 << 21).toString)) {
      spark.conf.set("graft.sq8.shortlist", bad)
      try {
        val e = intercept[Exception] {
          graft.SparkEntry.queries("sim_sq8_ann")(spark, sf).collect()
        }
        assert(e.getMessage.contains("graft.sq8.shortlist"))
      } finally spark.conf.unset("graft.sq8.shortlist")
    }
  }
}
