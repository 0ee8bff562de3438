package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins graph_triangles and graph_jaccard beyond the oracle with an
  * independent plain-Scala recompute from the same kNN edge list,
  * plus the algorithms' contracts: the coefficient's micro-unit
  * arithmetic, Jaccard's [0, 1e6] bounds, and the non-edge guarantee
  * of the link-prediction candidates.
  */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private lazy val edges: Seq[(Long, Long)] =
    graft.SparkEntry.queries("sim_knn_graph")(spark, sf)
      .select("vec_id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  // undirected adjacency (the queries' `sym`)
  private lazy val adj: Map[Long, Set[Long]] =
    (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val nodes: Seq[Long] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  test("graph_triangles matches the plain-Scala recompute exactly") {
    val got = graft.SparkEntry.queries("graph_triangles")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === nodes.length)
    got.foreach { case (v, deg, tri, cc) =>
      val nbrs = adj.getOrElse(v, Set.empty)
      assert(deg === nbrs.size.toLong, s"vec $v degree")
      val expTri = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      assert(tri === expTri.toLong, s"vec $v triangle count")
      val expCc =
        if (deg >= 2) 2L * tri * 1000000L / (deg * (deg - 1L)) else 0L
      assert(cc === expCc, s"vec $v clustering coefficient")
    }
  }

  test("graph_jaccard matches the plain-Scala top-20 exactly") {
    val got = graft.SparkEntry.queries("graph_jaccard")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val cand = (for {
      (v, nbrs) <- adj.toSeq
      n <- nbrs
      b <- adj(n) if v < b && !nbrs.contains(b)
    } yield (v, b)).distinct.map { case (a, b) =>
      val inter = (adj(a) & adj(b)).size.toLong
      val jac = inter * 1000000L / (adj(a).size + adj(b).size - inter)
      (a, b, inter, adj(a).size.toLong, adj(b).size.toLong, jac)
    }
    val exp = cand.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(20)
    assert(got.toSeq === exp)
  }

  test("jaccard candidates are non-edges with sane bounds") {
    val got = graft.SparkEntry.queries("graph_jaccard")(spark, sf)
      .collect()
    got.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getLong(5))
      assert(a < b, "pairs are low-high oriented")
      assert(!adj(a).contains(b), s"($a,$b) is already an edge")
      assert(j >= 0L && j <= 1000000L, s"jac_micro $j out of range")
    }
  }
}
