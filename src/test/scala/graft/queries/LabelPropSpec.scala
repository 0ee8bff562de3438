package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins graph_label_prop beyond the oracle with an independent
  * plain-Scala recompute of the synchronous clamped-seed majority-vote
  * rounds from the same kNN edge list, plus the algorithm's
  * contracts: seeds never move, assigned labels never un-assign, and
  * every propagated label is one some node actually seeded.
  */
class LabelPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private lazy val result =
    graft.SparkEntry.queries("graph_label_prop")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2)))

  private lazy val labels: Map[Long, Int] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private lazy val edges: Seq[(Long, Long)] =
    graft.SparkEntry.queries("sim_knn_graph")(spark, sf)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** The reference implementation: LpIters synchronous rounds. */
  private lazy val expected: Map[Long, Int] = {
    val seed: Map[Long, Boolean] =
      labels.keys.map(v => v -> (v % SimilarityQueries.LpSeedMod == 0)).toMap
    val in = edges.groupBy(_._1) // src -> its neighbor list
    var st: Map[Long, Int] =
      labels.map { case (v, l) => v -> (if (seed(v)) l else -1) }
    for (_ <- 1 to SimilarityQueries.LpIters) {
      val next = st.map { case (v, cur) =>
        if (seed(v)) v -> cur
        else {
          val votes = in.getOrElse(v, Seq.empty)
            .map(e => st(e._2)).filter(_ >= 0)
            .groupBy(identity).view.mapValues(_.size).toSeq
          if (votes.isEmpty) v -> cur
          else v -> votes.minBy { case (l, n) => (-n, l) }._1
        }
      }
      st = next
    }
    st
  }

  test("query output matches the plain-Scala recompute exactly") {
    assert(result.length === labels.size)
    result.foreach { case (v, _, lbl) =>
      assert(lbl === expected(v), s"vec $v: query $lbl != recompute")
    }
  }

  test("seeds stay clamped to their stored label") {
    result.filter(_._2).foreach { case (v, _, lbl) =>
      assert(lbl === labels(v), s"seed $v moved to $lbl")
    }
  }

  test("propagation strictly grows coverage beyond the seed set") {
    val nSeeds = result.count(_._2)
    val nLabeled = result.count(_._3 >= 0)
    assert(nLabeled > nSeeds,
      s"no labels propagated ($nSeeds seeds, $nLabeled labeled)")
  }

  test("every propagated label was seeded by some node") {
    val seededLabels = result.filter(_._2).map(_._3).toSet
    result.filter(_._3 >= 0).foreach { case (v, _, lbl) =>
      assert(seededLabels.contains(lbl),
        s"vec $v carries label $lbl that no seed holds")
    }
  }
}
