package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the hot-shingle document-frequency ceiling that keeps the
  * posting-list near-dup detectors alive at scale: a boilerplate
  * shingle shared by f documents contributes f²/2 rows to the
  * inverted-index self-join (10¹² pairs from one key on a real crawl)
  * while carrying no near-dup signal. The ceiling must (a) drop such
  * shingles from the join, (b) bound the pair count, and (c) leave
  * verdicts on true near-duplicates unchanged.
  *
  * Corpus: 120 documents sharing one boilerplate 3-gram ("all rights
  * reserved", df = 120 > the default ceiling of 64) with otherwise
  * unique text, plus one true near-dup pair (docs 200/201) sharing a
  * 12-word tail whose shingles all have df = 2.
  */
class HotShingleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private lazy val dir: String = {
    val d = Files.createTempDirectory("hotshingle").toString
    import spark.implicits._
    val boiler = (0 until 120).map { i =>
      (i.toLong, s"all rights reserved u${i}a u${i}b u${i}c u${i}d")
    }
    val tail = (1 to 12).map(j => s"c$j").mkString(" ")
    val dups = Seq((200L, s"alpha $tail"), (201L, s"beta $tail"))
    (boiler ++ dups)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def shingles: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.WordShingles(col("text"), 3).alias("sh"))

  private def withMemo[A](f: => A): A = {
    spark.conf.set("graft.stage.dir", "off")
    try f finally spark.conf.unset("graft.stage.dir")
  }

  test("the ceiling drops the hot shingle and bounds every posting list") {
    val capped = DedupQueries.cappedInvOf(shingles, 64L)
    val hot = capped.filter(col("s") === "all rights reserved").count()
    assert(hot === 0L, "the df-120 boilerplate shingle must be dropped")
    val maxDf = capped.groupBy("s").agg(count(lit(1)).alias("df"))
      .agg(max(col("df"))).head().getLong(0)
    assert(maxDf <= 64L, s"surviving posting lists must be <= cap, got $maxDf")
  }

  test("the posting self-join is bounded: 10 pairs capped vs 7150 uncapped") {
    def joinRows(cap: Long): Long = {
      val inv = DedupQueries.cappedInvOf(shingles, cap)
      inv.alias("a").join(inv.alias("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .count()
    }
    // capped: only the true near-dup pair's 10 shared tail shingles
    assert(joinRows(64L) === 10L)
    // uncapped, the one hot key alone explodes into C(120,2) rows —
    // the quadratic blow-up the ceiling exists to prevent
    assert(joinRows(1000000L) === 10L + 7140L)
  }

  test("true near-dup verdicts are unchanged by the cap") {
    withMemo {
      def pairs(q: String): Seq[(Long, Long)] =
        DedupQueries.queries(q)(spark, dir)
          .select("ida", "idb").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val jac = DedupQueries.queries("dd_ngram_jaccard")(spark, dir).collect()
      assert(jac.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((200L, 201L)))
      val row = jac.head
      assert(row.getAs[Long]("common") === 10L)
      assert(row.getAs[Long]("sa") === 11L && row.getAs[Long]("sb") === 11L)
      assert(pairs("dd_containment") === Seq((200L, 201L)))
      // lifting the ceiling reports the same verdicts (boilerplate-only
      // pairs share 1 shingle -> jac 1/9 and containment 1/5, both
      // under threshold): the cap removes cost, not signal
      spark.conf.set("graft.dedup.maxShingleDf", "1000000")
      try {
        assert(pairs("dd_ngram_jaccard") === Seq((200L, 201L)))
        assert(pairs("dd_containment") === Seq((200L, 201L)))
      } finally spark.conf.unset("graft.dedup.maxShingleDf")
    }
  }

  test("the knob rejects a ceiling that would drop every shared shingle") {
    spark.conf.set("graft.dedup.maxShingleDf", "1")
    try intercept[IllegalArgumentException] {
      withMemo(DedupQueries.queries("dd_ngram_jaccard")(spark, dir).count())
    } finally spark.conf.unset("graft.dedup.maxShingleDf")
  }
}
