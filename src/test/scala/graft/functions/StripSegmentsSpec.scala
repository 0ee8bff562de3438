package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 StripSegments kernel byte-equal to the exploded
  * legacy spelling of tx_boilerplate's strip + reassembly (explode
  * 5-word segments → h60 → (source, lh) anti-join → ordered
  * collect_list → array_join " ") on real documents at sf0.001 with
  * the real per-domain df table, plus edge cases: empty drop set
  * (identity under segment re-join), everything stripped, short
  * trailing segment, empty text, NULL text.
  */
class StripSegmentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val W = 5

  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  private def lines(in: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    val nl = ceil(size(ws) / lit(W.toDouble)).cast(LongType)
    val segs = transform(
      sequence(lit(0L), nl - 1),
      i => struct(i.alias("line_no"),
        array_join(slice(ws, (i * W + 1).cast("int"), lit(W)), " ")
          .alias("line")))
    in.select(col("doc_id"), col("source"), explode(segs).alias("ln"))
      .select(col("doc_id"), col("source"),
        col("ln.line_no").alias("line_no"), col("ln.line").alias("line"))
      .withColumn("lh", h60(col("line")))
  }

  test("matches the exploded anti-join strip on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"), col("text"))
    // low threshold so the fixture exercises real strips
    val boiler = lines(docs).select(col("source"), col("lh"), col("doc_id"))
      .distinct()
      .groupBy("source", "lh").agg(count(lit(1)).alias("df"))
      .filter(col("df") >= 2)
      .select(col("source"), col("lh"))
    assert(boiler.count() > 0, "fixture must exercise real strips")

    val kept = lines(docs).join(boiler, Seq("source", "lh"), "left_anti")
    val legacy = docs.select(col("doc_id"))
      .join(kept.groupBy("doc_id")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("line_no"), col("line")))),
            x => x.getField("line")), " ").alias("kept_text"),
          count(lit(1)).alias("n_kept")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).alias("kept_text"),
        coalesce(col("n_kept"), lit(0L)).alias("n_kept"))

    val sets = boiler.groupBy("source").agg(collect_set(col("lh")).alias("bhs"))
    val native = docs.join(sets, Seq("source"), "left")
      .select(col("doc_id"), StripSegments(col("text"),
        coalesce(col("bhs"), expr("array()").cast("array<bigint>")), W)
        .alias("m"))
      .select(col("doc_id"),
        coalesce(col("m.kept_text"), lit("")).alias("kept_text"),
        coalesce(col("m.n_kept"), lit(0L)).alias("n_kept"))

    assert(legacy.exceptAll(native).count() === 0)
    assert(native.exceptAll(legacy).count() === 0)
  }

  test("edge cases: identity, full strip, short tail, empty, null") {
    import spark.implicits._
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var v = 0L; (0 until 8).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      v >>> 4
    }
    def run(text: String, drop: Seq[Long]): (String, Long) = {
      val r = Seq((text, drop)).toDF("t", "c")
        .select(StripSegments(col("t"), col("c"), W).alias("m"))
        .select(col("m.kept_text"), col("m.n_kept")).head()
      (r.getString(0), r.getLong(1))
    }
    val ten = "a b c d e f g h i j" // segments: "a b c d e", "f g h i j"
    assert(run(ten, Seq.empty) === ((ten, 2L)))
    assert(run(ten, Seq(h("a b c d e"))) === (("f g h i j", 1L)))
    assert(run(ten, Seq(h("a b c d e"), h("f g h i j"))) === (("", 0L)))
    val tail = "a b c d e f g" // short trailing segment "f g"
    assert(run(tail, Seq(h("f g"))) === (("a b c d e", 1L)))
    assert(run("", Seq.empty) === (("", 1L))) // one empty segment
    assert(run("", Seq(h(""))) === (("", 0L)))
    val nul = Seq((Option.empty[String], Seq.empty[Long])).toDF("t", "c")
      .select(StripSegments(col("t"), col("c"), W)).head()
    assert(nul.isNullAt(0))
  }
}
