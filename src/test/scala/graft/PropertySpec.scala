package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ByteSumMod, DotProduct, Fingerprint}
import graft.operators.Partitioning
import graft.queries.GroupRank
import graft.streaming.CommitTracker
import graft.streaming.CommitTracker.{CommitInput, TrackerState}

/** Property-based tests (scalacheck) for the components with clean
  * algebraic models: the commit-watermark protocol, the codegen
  * expressions (vs plain-Scala reference folds), the salted join
  * (vs the plain join), and GroupRank (vs the single-node window).
  * Example-based specs pin known edge cases; these pin the LAWS on
  * randomized inputs with shrinking.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.builder("4").getOrCreate()

  private def check(prop: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minTests)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  // ---------------------------------------------------------------
  // CommitTracker: the contiguous-prefix law under ANY delivery order
  // ---------------------------------------------------------------

  /** Scenario: counts 1..n each announced (needConfirm) and a random
    * SUBSET confirmed, in a random interleaving with duplicates,
    * split across random batch boundaries. Law: the concatenated
    * Committables are disjoint contiguous ranges from 1, and the
    * final watermark is exactly the longest confirmed prefix.
    */
  private val commitScenario: Gen[(Int, Set[Int], Seq[CommitInput], Int)] =
    for {
      n <- Gen.choose(1, 40)
      confirmed <- Gen.someOf(1 to n)
      dupFactor <- Gen.choose(1, 2)
      seed <- Gen.choose(0L, Long.MaxValue)
      nBatches <- Gen.choose(1, 5)
    } yield {
      val rnd = new scala.util.Random(seed)
      val announce = (1 to n).map(c =>
        CommitInput("r", c.toLong, needConfirm = true, Some(s"t$c")))
      // confirmations may arrive more than once (at-least-once)
      val confirm = confirmed.toSeq.flatMap(c =>
        Seq.fill(dupFactor)(
          CommitInput("r", c.toLong, needConfirm = false, Some(s"t$c"))))
      // announcement always precedes its own confirmation; otherwise free
      val evs = rnd.shuffle(announce ++ confirm).foldLeft(
        (Set.empty[Long], Vector.empty[CommitInput])) {
        case ((seen, acc), ev) =>
          if (!ev.needConfirm && !seen.contains(ev.count))
            (seen, acc :+ ev.copy(needConfirm = true) :+ ev)
          else (seen + ev.count, acc :+ ev)
      }._2
      (n, confirmed.toSet, evs, nBatches)
    }

  test("commit watermark = longest confirmed prefix, ranges disjoint " +
      "and contiguous, state evicted — any order, any batching") {
    check(Prop.forAll(commitScenario) { case (n, confirmed, evs, nBatches) =>
      val batches = evs.grouped(math.max(1, evs.size / nBatches)).toSeq
      val (finalSt, ranges) = batches.foldLeft(
        (CommitTracker.emptyState, Vector.empty[(Long, Long)])) {
        case ((st, acc), batch) =>
          val (st2, out) = CommitTracker.drain(st, batch.iterator, "r")
          (st2, acc ++ out.map(c => (c.fromCount, c.toCount)))
      }
      val wantPrefix = (1 to n).takeWhile(confirmed.contains).size.toLong
      val contiguous = ranges.foldLeft((true, 1L)) {
        case ((ok, next), (from, to)) => (ok && from == next && to >= from, to + 1)
      }._1
      val covered = if (ranges.isEmpty) 0L else ranges.last._2
      Prop.all(
        Prop(contiguous) :| "ranges contiguous from 1, disjoint",
        Prop(covered == wantPrefix) :|
          s"covered $covered != longest confirmed prefix $wantPrefix",
        Prop(finalSt.lastCommitted == wantPrefix) :| "watermark",
        Prop(finalSt.confirmed.keys.forall(_ > wantPrefix) &&
          finalSt.unconfirmed.keys.forall(_ > wantPrefix)) :|
          "committed counts evicted from state")
    })
  }

  test("commit tracker never re-commits after resume from state") {
    // replaying an already-drained batch against the advanced state
    // must emit nothing new below the watermark (idempotent recovery)
    check(Prop.forAll(commitScenario) { case (_, _, evs, _) =>
      val (st1, out1) = CommitTracker.drain(
        CommitTracker.emptyState, evs.iterator, "r")
      val (st2, out2) = CommitTracker.drain(st1, evs.iterator, "r")
      val replayed = out2.toSeq
      Prop(replayed.forall(_.fromCount > st1.lastCommitted) &&
        st2.lastCommitted == st1.lastCommitted) :|
        s"redelivery re-committed below ${st1.lastCommitted}: $replayed"
    })
  }

  // ---------------------------------------------------------------
  // Codegen expressions vs plain-Scala reference folds
  // ---------------------------------------------------------------

  private def refByteSum(s: String, n: Int): Int =
    (s.getBytes("UTF-8").map(x => (x & 0xff).toLong).sum % n).toInt

  private def refFingerprint(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)

  test("ByteSumMod and Fingerprint match their reference folds on " +
      "random unicode strings (one batched job per sample set)") {
    import spark.implicits._
    val strs = Gen.listOfN(40,
      Gen.frequency(
        3 -> Gen.asciiPrintableStr,
        1 -> Gen.listOf(Gen.choose(0x20, 0x2FFF)).map(
          _.map(Character.toChars(_).mkString).mkString),
        1 -> Gen.const("")))
    check(Prop.forAll(strs, Gen.choose(1, 16)) { (ss, n) =>
      val rows = ss.toDF("s")
        .select(ByteSumMod(col("s"), n).alias("b"),
          Fingerprint(col("s")).alias("f"))
        .collect()
      Prop(rows.map(_.getInt(0)).toSeq == ss.map(refByteSum(_, n)) &&
        rows.map(_.getLong(1)).toSeq == ss.map(refFingerprint)) :|
        s"expression drifted from model for n=$n"
    }, minTests = 8)
  }

  test("DotProduct is bilinear-exact vs the Scala model on random vectors") {
    import spark.implicits._
    val vecPair = for {
      len <- Gen.choose(0, 64)
      a <- Gen.listOfN(len, Gen.choose(-1000000L, 1000000L))
      b <- Gen.listOfN(len, Gen.choose(-1000000L, 1000000L))
    } yield (a, b)
    check(Prop.forAll(Gen.listOfN(20, vecPair)) { pairs =>
      val rows = pairs.toDF("a", "b")
        .select(DotProduct(col("a"), col("b"))).collect().map(_.getLong(0))
      val want = pairs.map { case (a, b) =>
        a.zip(b).map { case (x, y) => x * y }.sum }
      Prop(rows.toSeq == want) :| "dot product drifted from model"
    }, minTests = 6)
  }

  // ---------------------------------------------------------------
  // Salted join ≡ plain join; GroupRank ≡ single-node window
  // ---------------------------------------------------------------

  test("saltedJoin result multiset equals the plain inner join") {
    import spark.implicits._
    val data = for {
      nL <- Gen.choose(0, 120)
      nS <- Gen.choose(0, 12)
      l <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 99L)))
      s <- Gen.listOfN(nS, Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 99L)))
    } yield (l, s)
    check(Prop.forAll(data, Gen.choose(2, 5)) { case ((l, s), salt) =>
      val large = l.toDF("k", "lv")
      val small = s.toDF("k", "sv")
      val plain = large.join(small, "k").groupBy("k", "lv", "sv").count()
      val salted = Partitioning.saltedJoin(large, small, "k", salt)
        .groupBy("k", "lv", "sv").count()
      Prop(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty) :|
        "salted join changed the result multiset"
    }, minTests = 5)
  }

  test("GroupRank.rank equals the single-node window row_number on " +
      "random grouped data") {
    import spark.implicits._
    val data = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 50L)))
    } yield rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
    check(Prop.forAll(data) { rows =>
      val df = rows.toDF("g", "v", "id")
      val got = GroupRank.rank(df, "g", Seq(col("v").asc, col("id").asc))
        .select("g", "id", "rn", "grp_n")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
      val want = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("grp_n", count(lit(1)).over(
          Window.partitionBy("g")).cast("long"))
        .select("g", "id", "rn", "grp_n")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      Prop(got == want) :| "GroupRank drifted from the window"
    }, minTests = 5)
  }

  test("GroupRank.runningSum equals the single-node window cumsum on " +
      "random grouped data") {
    import spark.implicits._
    val data = for {
      n <- Gen.choose(1, 300)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.oneOf("a", "b", "c"), Gen.choose(-20L, 50L)))
    } yield rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
    check(Prop.forAll(data) { rows =>
      val df = rows.toDF("g", "v", "id")
      val got = GroupRank.runningSum(df, "g", Seq(col("id").asc), "v")
        .select("g", "id", "run")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val w = Window.partitionBy("g").orderBy(col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("run", sum(col("v")).over(w))
        .select("g", "id", "run")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      Prop(got == want) :| "runningSum drifted from the window cumsum"
    }, minTests = 5)
  }

  // ---------------------------------------------------------------
  // StreamingLateness.fold: batch-boundary invariance
  // ---------------------------------------------------------------

  /** Law: a key's arrival-ordered stream folded through ANY chunking
    * (each chunk id-sorted internally, as the operator does per
    * micro-batch) emits exactly the single-pass feed and lands in the
    * same state — micro-batch boundaries are invisible, including
    * duplicate redelivery of a suffix (at-least-once replay).
    */
  test("lateness fold is invariant under batch boundaries and redelivery") {
    import graft.streaming.StreamingLateness
    import graft.streaming.StreamingLateness.{Ev, KeyState}
    val empty = KeyState(Long.MinValue, Long.MinValue)
    val gen = for {
      n <- Gen.choose(1, 120)
      ts <- Gen.listOfN(n, Gen.choose(0L, 200L))
      cuts <- Gen.listOfN(4, Gen.choose(0, n))
      replayFrom <- Gen.choose(0, n)
      shuffleSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val evs = ts.zipWithIndex.map { case (t, i) =>
        Ev(i.toLong, 1L, "u", t * 1000000L)
      }
      (evs, cuts.sorted, replayFrom, shuffleSeed)
    }
    check(Prop.forAll(gen) { case (evs, cuts, replayFrom, shuffleSeed) =>
      // the permutation comes from a GENERATED seed, so a failing
      // case replays exactly from scalacheck's report
      val rnd = new scala.util.Random(shuffleSeed)
      def run(batches: Seq[Seq[Ev]]) =
        batches.foldLeft((empty, Vector.empty[StreamingLateness.Late])) {
          case ((st, acc), b) =>
            // shuffle within the batch: the operator re-sorts by id
            val (st2, out) = StreamingLateness.fold(
              1L, rnd.shuffle(b).iterator, st)(
              _.event_id, _.ts, _.op_type)
            (st2, acc ++ out)
        }
      val oneShot = run(Seq(evs))
      val bounds = (0 +: cuts :+ evs.length).distinct.sorted
      val chunks = bounds.sliding(2).map {
        case Seq(a, b) => evs.slice(a, b)
      }.toSeq
      val chunked = run(chunks)
      // at-least-once: replay a suffix of already-applied events
      val replayed = run(chunks :+ evs.drop(replayFrom))
      (Prop(chunked == oneShot) :| "chunking changed the feed") &&
        (Prop(replayed == chunked) :| "redelivery re-emitted")
    }, minTests = 60)
  }

  test("ntileFromRank equals the SQL ntile window for random (n, k)") {
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(1, 200), Gen.oneOf(2, 3, 4, 7, 10, 16))
    check(Prop.forAll(gen) { case (n, k) =>
      val df = (1 to n).map(_.toLong).toDF("v")
      val w = Window.orderBy("v")
      val want = df.withColumn("nt", ntile(k).over(w).cast("long"))
        .select("v", "nt")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("nt",
          GroupRank.ntileFromRank(k, col("rn"), lit(n.toLong)))
        .select("v", "nt")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == want) :| s"ntileFromRank($k) drifted at n=$n"
    }, minTests = 8)
  }
}
