package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gate: recall@k of the learned-centroid IVF pipeline
  * must not silently regress. The oracle pins exact values; this spec
  * pins the *quality contract* — a mean-recall floor at the default
  * probe width, strict monotonicity in probes, and exact recovery of
  * brute force when probing every cell.
  */
class IvfRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  /** qid → recall at the given multi-probe width. */
  private def recalls(probes: Int): Map[Long, Double] = {
    spark.conf.set("graft.ivf.probes", probes.toString)
    try {
      graft.SparkEntry.queries("sim_recall_at_k")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    } finally spark.conf.unset("graft.ivf.probes")
  }

  test("mean recall@10 >= 0.8 at the default 2 probes") {
    val r = recalls(2)
    assert(r.size === SimilarityQueries.NQueries)
    val mean = r.values.sum / r.size
    assert(mean >= 0.8, s"mean recall degraded: $mean ($r)")
  }

  test("recall is monotone in probe width (2 -> 4 never loses a hit)") {
    val r2 = recalls(2)
    val r4 = recalls(4)
    r2.foreach { case (qid, rec2) =>
      assert(r4(qid) >= rec2,
        s"probe widening lost recall for qid=$qid: $rec2 -> ${r4(qid)}")
    }
  }

  test("probing all cells recovers brute force exactly (recall 1.0)") {
    val rAll = recalls(SimilarityQueries.NCentroids)
    rAll.foreach { case (qid, rec) =>
      assert(rec === 1.0, s"qid=$qid recall $rec with every cell probed")
    }
  }
}
