package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gate for the Matryoshka two-stage pipeline: recall@k
  * of prefix-shortlist + exact-rerank against the brute-force top-k.
  * On this corpus the embeddings are near-random synthetic vectors,
  * so the untrained 16-of-64 prefix behaves like a random projection
  * (Johnson-Lindenstrauss): it preserves coarse ordering, not fine —
  * measured mean recall ~0.44 at the 50-wide shortlist. Real MRL
  * embeddings concentrate signal in the prefix by training; here the
  * floor pins "doesn't regress", not "excellent" (same caveat as
  * PqRecallSpec). Same contract family: a floor at the default
  * shortlist, monotone in shortlist width, exact when the shortlist
  * covers the corpus.
  */
class MrlRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** qid → recall@TopK of sim_mrl_ann vs sim_cosine_topk. */
  private def recalls(shortlist: Int): Map[Long, Double] = {
    spark.conf.set("graft.mrl.shortlist", shortlist.toString)
    try {
      val exact = graft.SparkEntry.queries("sim_cosine_topk")(spark, sf)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val approx = graft.SparkEntry.queries("sim_mrl_ann")(spark, sf)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, e) =>
        qid -> approx.get(qid).map(a => (e & a).size.toDouble / e.size)
          .getOrElse(0.0)
      }
    } finally spark.conf.unset("graft.mrl.shortlist")
  }

  test("mean recall@10 >= 0.35 at the default 50-wide shortlist") {
    val r = recalls(SimilarityQueries.MrlShortlist)
    assert(r.size === SimilarityQueries.NQueries)
    val mean = r.values.sum / r.size
    assert(mean >= 0.35, s"mean MRL recall degraded: $mean ($r)")
  }

  test("recall is monotone in shortlist width (50 -> 150)") {
    val r50 = recalls(50)
    val r150 = recalls(150)
    r50.foreach { case (qid, rec) =>
      assert(r150(qid) >= rec,
        s"shortlist widening lost recall for qid=$qid: $rec -> ${r150(qid)}")
    }
  }

  test("a corpus-wide shortlist recovers brute force exactly") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count().toInt
    recalls(n).foreach { case (qid, rec) =>
      assert(rec === 1.0, s"qid=$qid recall $rec with full shortlist")
    }
  }
}
