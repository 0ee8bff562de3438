package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-recompute pin for the out-of-order profile (the
  * graph_pagerank discipline): the driver testdata is perfectly
  * key-ordered, so the oracle gate only ever exercises the zero-late
  * path — this spec perturbs event times at hour scale (the corpus's
  * intra-key spacing) and checks `CdcQueries.oooProfileOf` against a
  * plain-Scala recompute that shares NO Spark machinery with it.
  */
class OooProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("perturbed profile matches a plain-Scala recompute") {
    val rows = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        coalesce(col("event_type"), lit("")).alias("op_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        // hour-scale slips on every third event — real inversions
        if (r.getLong(0) % 3 == 0)
          r.getLong(3) - (r.getLong(0) % 20 + 1) * 3600L * 1000000000L
        else r.getLong(3)))

    // plain-Scala reference: per key in event_id order, late when the
    // running max of PRIOR event times exceeds ts
    case class Obs(op: String, user: Long, lateMs: Option[Long])
    val obs = rows.groupBy(_._2).values.flatMap { evs =>
      evs.sortBy(_._1).foldLeft((Long.MinValue, Vector.empty[Obs])) {
        case ((mx, acc), (_, u, op, ts)) =>
          val late = if (mx != Long.MinValue && mx > ts)
            Some((mx - ts) / 1000000L) else None
          (math.max(mx, ts), acc :+ Obs(op, u, late))
      }._2
    }.toSeq
    val want = obs.groupBy(_.op).map { case (op, os) =>
      op -> ((os.size.toLong, os.count(_.lateMs.isDefined).toLong,
        os.flatMap(_.lateMs).foldLeft(0L)(math.max),
        os.filter(_.lateMs.isDefined).map(_.user).distinct.size.toLong))
    }

    import spark.implicits._
    val df = rows.toSeq.toDF("event_id", "user_id", "op_type", "ts")
    val got = CdcQueries.oooProfileOf(df).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

    assert(got === want, "profile diverged from the independent recompute")
    assert(got.values.exists(_._2 > 0L),
      "the perturbation must produce late events")
  }
}
