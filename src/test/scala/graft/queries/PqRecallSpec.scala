package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gate for the PQ pipeline: recall@k of
  * ADC-shortlist + exact-rerank against the brute-force top-k, with
  * the contract that recall is monotone in shortlist width and exact
  * when the shortlist covers the corpus. (PQ recall on this corpus is
  * intrinsically modest — near-random synthetic embeddings are PQ's
  * worst case, there is no cluster structure for 3-bit codebooks to
  * exploit — so the floor pins "doesn't regress", not "excellent".)
  */
class PqRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** qid → recall@TopK of sim_pq_ann vs sim_cosine_topk. */
  private def recalls(shortlist: Int): Map[Long, Double] = {
    spark.conf.set("graft.pq.shortlist", shortlist.toString)
    try {
      val exact = graft.SparkEntry.queries("sim_cosine_topk")(spark, sf)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val approx = graft.SparkEntry.queries("sim_pq_ann")(spark, sf)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, e) =>
        qid -> approx.get(qid).map(a => (e & a).size.toDouble / e.size)
          .getOrElse(0.0)
      }
    } finally spark.conf.unset("graft.pq.shortlist")
  }

  test("mean recall@10 >= 0.6 at the default 50-wide shortlist") {
    val r = recalls(50)
    assert(r.size === SimilarityQueries.NQueries)
    val mean = r.values.sum / r.size
    assert(mean >= 0.6, s"mean PQ recall degraded: $mean ($r)")
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
}
