package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 CutWords kernel byte-equal to the exploded legacy
  * spelling of tx_span_cut's reassembly (posexplode → anti-join cut
  * positions → ordered collect_list → array_join " ") on the real
  * span-family pipeline at sf0.001, plus the edge cases the corpus
  * may not exercise: empty cut set (identity — split-then-join keeps
  * empties), fully-cut docs, out-of-range/unsorted cut positions,
  * repeated/leading/trailing spaces, NULL text.
  */
class CutWordsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  test("matches the exploded anti-join reassembly on real documents") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val grams = docs
      .select(col("doc_id"),
        explode(PosGramHashes(col("text"), 16)).alias("sg"))
      .select(col("doc_id"), col("sg.p").alias("p"),
        col("sg.gh").alias("gh"))
    val dup = grams.groupBy("gh")
      .agg(count(lit(1)).alias("occ")).filter(col("occ") >= 2)
      .select(col("gh"))
    val cutPosRows = grams.join(dup, "gh")
      .select(col("doc_id"), explode(expr("sequence(p, p + 15)")).alias("p"))
    assert(cutPosRows.count() > 0, "fixture must exercise real cuts")

    val w = split(col("text"), " ")
    val words = docs
      .select(col("doc_id"), posexplode(w).as(Seq("p0", "wd")))
      .select(col("doc_id"),
        (col("p0") + 1).cast(LongType).alias("p"), col("wd"))
    val legacy = words
      .join(cutPosRows.distinct(), Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("wd")))),
          x => x.getField("wd")), " ").alias("kept_text"),
        count(lit(1)).alias("n_kept_words"))
    val legacyFull = docs.select(col("doc_id"))
      .join(legacy, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).alias("kept_text"),
        coalesce(col("n_kept_words"), lit(0L)).alias("n_kept_words"))

    val cuts = cutPosRows.groupBy("doc_id")
      .agg(collect_set(col("p")).alias("cuts"))
    val native = docs.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), CutWords(col("text"),
        coalesce(col("cuts"), expr("array()").cast("array<bigint>")))
        .alias("m"))
      .select(col("doc_id"),
        coalesce(col("m.kept_text"), lit("")).alias("kept_text"),
        coalesce(col("m.n_kept_words"), lit(0L)).alias("n_kept_words"))

    assert(legacyFull.exceptAll(native).count() === 0)
    assert(native.exceptAll(legacyFull).count() === 0)
  }

  test("edge cases: identity, full cut, unsorted/out-of-range, spaces, null") {
    import spark.implicits._
    def run(text: String, cuts: Seq[Long]): (String, Long) = {
      val r = Seq((text, cuts)).toDF("t", "c")
        .select(CutWords(col("t"), col("c")).alias("m"))
        .select(col("m.kept_text"), col("m.n_kept_words")).head()
      (r.getString(0), r.getLong(1))
    }
    assert(run("a b c", Seq.empty) === (("a b c", 3L)))
    assert(run("a  b ", Seq.empty) === (("a  b ", 4L))) // empties kept
    assert(run("a b c", Seq(1L, 2L, 3L)) === (("", 0L)))
    assert(run("a b c d", Seq(3L, 1L)) === (("b d", 2L))) // unsorted cuts
    assert(run("a b", Seq(5L, 2L, 99L)) === (("a", 1L))) // out of range
    assert(run("", Seq.empty) === (("", 1L))) // split("",-1) = one empty token
    assert(run("", Seq(1L)) === (("", 0L)))
    val nul = Seq((Option.empty[String], Seq.empty[Long])).toDF("t", "c")
      .select(CutWords(col("t"), col("c"))).head()
    assert(nul.isNullAt(0))
  }
}
