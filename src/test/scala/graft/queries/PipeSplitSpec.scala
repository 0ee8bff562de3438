package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipe_split's contract: a deterministic 80/10/10 document split in
  * which near-duplicates (dd_cluster components) never straddle
  * splits — the leakage guarantee that makes a held-out set actually
  * held out.
  */
class PipeSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.01"

  private def split() =
    graft.SparkEntry.queries("pipe_split")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("every document appears exactly once, with a valid split label") {
    val s = split()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(s.size.toLong === nDocs)
    assert(s.values.forall { case (_, b, l) =>
      b >= 0 && b < 100 &&
        (l == "train" || l == "valid" || l == "test")
    })
    // label is a pure function of the bucket
    s.values.foreach { case (_, b, l) =>
      val want = if (b < 80) "train" else if (b < 90) "valid" else "test"
      assert(l === want)
    }
  }

  test("no near-dup cluster straddles two splits (the leakage guarantee)") {
    val s = split()
    val clusters = DedupQueries.queries("dd_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.nonEmpty, "corpus has no near-dup pairs to test with")
    val byCluster = clusters.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val labels = members.map { case (doc, _) => s(doc)._3 }.distinct
      assert(labels.length === 1,
        s"cluster $cid spans splits ${labels.mkString(",")}")
      // and every member's representative IS the cluster label
      members.foreach { case (doc, _) => assert(s(doc)._1 === cid) }
    }
    // docs outside any cluster are their own representative
    val inCluster = clusters.map(_._1).toSet
    s.foreach { case (doc, (rep, _, _)) =>
      if (!inCluster(doc)) assert(rep === doc)
    }
  }

  test("the split is deterministic and roughly 80/10/10") {
    val a = split()
    val b = split()
    assert(a === b, "two evaluations must assign identically")
    val byLabel = a.values.groupBy(_._3).view.mapValues(_.size).toMap
    val n = a.size.toDouble
    // the hash is uniform over representatives; at 500 docs these
    // symmetric bands sit > 6 sigma from the 0.8/0.1/0.1 means, so a
    // correct split never trips them while a skewed one (e.g. 97/2/1)
    // fails loudly
    val train = byLabel.getOrElse("train", 0) / n
    assert(train > 0.65 && train < 0.92, s"train share: $byLabel")
    assert(byLabel.getOrElse("valid", 0) / n > 0.03, s"valid share: $byLabel")
    assert(byLabel.getOrElse("test", 0) / n > 0.03, s"test share: $byLabel")
  }
}
