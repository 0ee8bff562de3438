package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gate for the composed IVF-PQ pipeline: the coarse cell
  * restriction can only ever REMOVE candidates relative to plain PQ
  * (same codes, same LUT, same shortlist/rerank tail), so per-probe
  * recall vs brute force is bounded above by sim_pq_ann's — and must
  * still clear a floor, because a bug that mis-assigns cells would
  * silently empty the posting lists while staying deterministic
  * enough to fool nothing but the hash gate's own oracle.
  */
class IvfPqRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def topSets(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.queries(name)(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

  test("IVF-PQ recall: nonempty per probe, bounded by plain PQ, floor 0.2") {
    val exact = topSets("sim_cosine_topk")
    val pq = topSets("sim_pq_ann")
    val ivfpq = topSets("sim_ivfpq_ann")
    assert(ivfpq.keySet === exact.keySet, "a probe lost all results")
    val recalls = exact.map { case (qid, e) =>
      val r = ivfpq(qid).intersect(e).size.toDouble / e.size
      val rPq = pq(qid).intersect(e).size.toDouble / e.size
      // cell restriction prunes candidates; it cannot ADD recall
      // beyond what the identical PQ tail reachable-set allows —
      // tolerate rank-tie reshuffling at the shortlist boundary only
      assert(r <= rPq + 0.21,
        s"qid=$qid: IVF-PQ recall $r implausibly above PQ $rPq")
      r
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean IVF-PQ recall collapsed: $mean")
  }
}
