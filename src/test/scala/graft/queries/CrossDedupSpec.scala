package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives the cross-snapshot dedup core on a synthetic corpus where
  * all three verdicts are reachable — the sf corpus has no
  * byte-identical duplicates, so the 'exact' branch only shows here.
  * New snapshot = odd doc_ids, existing corpus = even.
  */
class CrossDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  // 200 distinct words per doc: a one-word tail edit then changes a
  // single trigram shingle (Jaccard ≈ 199/201 ≈ 0.99), comfortably
  // above the ≥31/32 signature-agreement verify bar.
  private def base(i: Int): String =
    (0 until 200).map(j => s"w${(i * 7 + j * 13) % 997}").mkString(" ")

  test("exact, near, and keep verdicts on a constructed corpus") {
    import spark.implicits._
    val docs = Seq(
      // pair (0,1): byte-identical → new doc 1 is 'exact'
      (0L, base(0)),
      (1L, base(0)),
      // pair (2,3): one word edited at the tail → near-dup (shares
      // almost all shingles, never byte-equal)
      (2L, base(2)),
      (3L, base(2).split(" ").dropRight(1).mkString(" ") + " zzz"),
      // 5 has no counterpart in the even snapshot → 'keep'
      (4L, base(4)),
      (5L, base(99))).toDF("doc_id", "text")
    val sig = DedupQueries.signaturesOf(docs)
    val out = DedupQueries.crossDedup(docs, sig)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "exact", 3L -> "near", 5L -> "keep"))
  }

  test("an exact duplicate that also band-collides still reports 'exact'") {
    import spark.implicits._
    val docs = Seq((0L, base(0)), (1L, base(0))).toDF("doc_id", "text")
    val out = DedupQueries.crossDedup(docs, DedupQueries.signaturesOf(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // identical docs share every band key (near would also fire);
    // the exact tier takes precedence
    assert(out === Map(1L -> "exact"))
  }

  test("old-snapshot docs never receive a verdict row") {
    import spark.implicits._
    val docs = Seq((0L, base(0)), (2L, base(2)), (1L, base(1)))
      .toDF("doc_id", "text")
    val ids = DedupQueries.crossDedup(docs, DedupQueries.signaturesOf(docs))
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }
}
