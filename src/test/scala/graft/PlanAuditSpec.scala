package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape audit over EVERY query's physical plan: the properties
  * that must survive a 100× scale-up, asserted as regressions.
  *
  *  - no CartesianProduct, ever (an unconstrained O(N²) pair scan);
  *  - BroadcastNestedLoopJoin only where a deliberately tiny dimension
  *    (band table, probe set, 1-row scalar) is broadcast against a
  *    non-equi predicate;
  *  - Exchange SinglePartition only for final one-row aggregates —
  *    never as a data-path stage (the global-window trap).
  *
  * Audited at BOTH sf0.001 and the bench scale sf0.1: broadcast
  * thresholds and AQE decisions are statistics-driven, so a plan that
  * is clean at the small factor can regress at the larger one (the
  * exact blind spot a fixed-sf audit would have).
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // override with SPARK_GRAFT_AUDIT_SFS=/path1,/path2 if needed
  private val sfs: Seq[String] = sys.env.get("SPARK_GRAFT_AUDIT_SFS")
    .map(_.split(",").toSeq)
    .getOrElse(Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1"))

  // formatted mode: scan blocks print complete (untruncated)
  // ReadSchema/PushedFilters lines
  private lazy val plans: Seq[(String, String, String)] =
    for {
      sf <- sfs
      (n, f) <- SparkEntry.queries.toSeq
    } yield (sf, n,
      f(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))

  // Queries whose RESULT is a single row (global scalar aggregate):
  // the one-partition final exchange is inherent and carries one row.
  // tx_tfidf's result is per-doc, but it embeds one such aggregate —
  // the corpus count N (one long per partition into one row, then
  // broadcast); the document-scale path never funnels.
  private val singleRowAggregates =
    Set("c1_commit_watermark", "rel_approx_distinct", "rel_distinct",
      "tx_tfidf")

  // Queries that intentionally broadcast a tiny build side against a
  // non-equi / cross predicate (band dim, probe rows, hyperplanes,
  // centroids, 1-row scalar).
  private val broadcastNonEqui = Set(
    "rel_range_join", "c1_commit_watermark", "sim_cosine_topk",
    "sim_lsh_bucket", "sim_lsh_ann", "sim_ivf_ann", "sim_ivf_kmeans",
    "sim_recall_at_k", // inherits its sub-pipelines' centroid/probe broadcasts
    "dd_embed_cosine",
    "dd_semdedup", // centroid table broadcast against every vector
    "sim_filtered_ann", // broadcast probe rows against the filtered corpus
    "pipe_curate", // inherits dd_semdedup's centroid broadcast
    "tx_tfidf") // 1-row corpus-count scalar broadcast

  test("no query plan contains a CartesianProduct") {
    plans.foreach { case (sf, n, p) =>
      assert(!p.contains("CartesianProduct"),
        s"$n has a cartesian product at $sf")
    }
  }

  test("single-partition exchanges only in one-row scalar aggregates") {
    plans.foreach { case (sf, n, p) =>
      if (!singleRowAggregates(n)) {
        assert(!p.contains("SinglePartition"),
          s"$n funnels data through one partition at $sf")
      }
    }
  }

  test("nested-loop joins only where a tiny side is deliberately broadcast") {
    plans.foreach { case (sf, n, p) =>
      if (!broadcastNonEqui(n)) {
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$n has an unexpected nested-loop join at $sf")
      }
    }
  }

  test("parquet scans prune columns (no full-width reads)") {
    // No query legitimately needs every column of a wide table: a scan
    // whose ReadSchema carries ALL of a table's columns means pruning
    // regressed (e.g. the full documents `text` payload dragged along).
    val wideTables = Seq("events", "documents", "orders", "lineitem",
      "customer")
    for (sf <- sfs) {
      val tableCols: Map[String, Seq[String]] = wideTables.map(t =>
        t -> Tables.load(spark, sf, t).schema.fieldNames.toSeq).toMap
      val readSchemas = plans.filter(_._1 == sf).flatMap { case (_, n, p) =>
        "ReadSchema: struct<([^\n]*)".r.findAllMatchIn(p)
          .map(m => (n, m.group(1)))
      }
      for ((q, rs) <- readSchemas; (t, cols) <- tableCols) {
        assert(!cols.forall(c => rs.contains(s"$c:")),
          s"$q reads every column of $t at $sf: $rs")
      }
    }
  }
}
