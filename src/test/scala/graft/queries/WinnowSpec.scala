package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the winnowing core (Schleimer et al. 2003) beyond the oracle:
  * an independent plain-Scala recompute of the k=5/w=4 rightmost-min
  * selection on synthetic documents, the paper's coverage guarantee
  * (any shared run of >= w+k-1 words yields a shared fingerprint),
  * and the short-document edge cases.
  */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("2").getOrCreate()
  import scala.jdk.CollectionConverters._

  private val K = 5 // gram width
  private val W = 4 // window width

  /** h60: first 15 hex chars of md5 as a 60-bit long — the engine-
    * portable hash both the query and the oracle use.
    */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Reference winnowing: selected fingerprint hash set per doc. */
  private def winnow(text: String): Set[Long] = {
    val wds = text.split(" ")
    if (wds.length < K + W - 1) return Set.empty
    val hs = wds.sliding(K).map(_.mkString(" ")).map(h60).toVector
    (0 to hs.length - W).map { j =>
      val win = hs.slice(j, j + W)
      // minimum hash, rightmost on ties
      val m = win.min
      val p = win.lastIndexOf(m)
      (hs(j + p), j + p)
    }.map(_._1).toSet
  }

  private def fingerprints(rows: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val df = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    DedupQueries.winnowFingerprintsOf(df).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
      .withDefaultValue(Set.empty)
  }

  private val words =
    "the quick brown fox jumps over a lazy dog near the old stone bridge " +
      "while birds sing softly in the morning light above the river"

  test("query fingerprints match the plain-Scala winnowing exactly") {
    val docs = Seq(
      1L -> words,
      2L -> words.split(" ").reverse.mkString(" "),
      3L -> "completely different tokens altogether here now today folks")
    val got = fingerprints(docs)
    docs.foreach { case (id, text) =>
      assert(got(id) === winnow(text), s"doc $id fingerprint set")
    }
  }

  test("coverage guarantee: a shared >= w+k-1 word run shares a fingerprint") {
    // two otherwise-different documents embedding the same 12-word run
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"
    val a = s"one two three four five six seven $run red blue green yellow"
    val b = s"purple orange cyan magenta $run nine ten eleven twelve thirteen"
    val got = fingerprints(Seq(10L -> a, 20L -> b))
    assert((got(10L) & got(20L)).nonEmpty,
      "shared 12-word run produced no shared fingerprint")
  }

  test("documents shorter than w+k-1 words produce no fingerprints") {
    val got = fingerprints(Seq(
      1L -> "a b c d",            // shorter than one gram
      2L -> "a b c d e f g"))     // grams exist but no full window
    assert(got(1L).isEmpty && got(2L).isEmpty)
  }

  test("selection is a subset of the document's gram hashes") {
    val got = fingerprints(Seq(1L -> words))
    val all = words.split(" ").sliding(K).map(_.mkString(" "))
      .map(h60).toSet
    assert(got(1L).subsetOf(all))
    assert(got(1L).nonEmpty)
  }
}
