package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention self-description (r9 verdict #1):
  * the committed-baseline reader, the per-query outlier rule, and the
  * batch↔streaming envelope agreement band. Pure decision logic — no
  * Spark needed.
  */
class BenchOutliersSpec extends AnyFunSuite {

  test("committedQueryTimes parses the committed artifact shape") {
    val tmp = java.nio.file.Files.createTempFile("bench_prev", ".json")
    java.nio.file.Files.write(tmp,
      ("""{"metric":"total","value":114.0,"unit":"sec",""" +
        """"queries":{"q_a":0.5,"q_b":1.25,"q_int":2},""" +
        """"capped":[],"sf":"/x"}""").getBytes("UTF-8"))
    val m = Bench.committedQueryTimes(tmp.toString)
    assert(m == Map("q_a" -> 0.5, "q_b" -> 1.25, "q_int" -> 2.0))
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("committedQueryTimes is empty on absent or malformed files") {
    assert(Bench.committedQueryTimes("/nonexistent/bench_out.json").isEmpty)
    val tmp = java.nio.file.Files.createTempFile("bench_bad", ".json")
    java.nio.file.Files.write(tmp, "not json at all".getBytes("UTF-8"))
    assert(Bench.committedQueryTimes(tmp.toString).isEmpty)
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("outlier rule: >2x committed plus the 0.3s noise floor") {
    // the r9 driver-run suspects would all have been flagged
    assert(Bench.isOutlier(3.44, 0.60)) // tx_repetition
    assert(Bench.isOutlier(3.18, 0.96)) // pipe_pack
    assert(Bench.isOutlier(3.31, 1.39)) // rel_wait_suppliers
    // ordinary jitter is not
    assert(!Bench.isOutlier(1.2, 0.9))
    assert(!Bench.isOutlier(0.4, 0.1)) // sub-second noise under the floor
    assert(!Bench.isOutlier(2.0, 1.0)) // exactly 2x + floor not exceeded
    // no committed value -> never an outlier
    assert(!Bench.isOutlier(10.0, 0.0))
    assert(!Bench.isOutlier(10.0, -1.0))
  }

  test("slow-figure rule: below 2/3 committed flags consistent depression") {
    // the hog-validation run: both envelope figures depressed
    // together (0.58x), pair agreed within band — still named
    assert(Bench.isSlowFigure(161809L, 280081.0))
    assert(Bench.isSlowFigure(184752L, 334989.0)) // r9 driver, 0.55x
    // calm-to-calm host variance (>= 0.83x observed) never flags
    assert(!Bench.isSlowFigure(253860L, 304204.0)) // 0.83x
    assert(!Bench.isSlowFigure(279923L, 334989.0)) // 0.84x
    assert(!Bench.isSlowFigure(280081L, 280081.0))
    assert(!Bench.isSlowFigure(-1L, 280081.0)) // failed measurement
    assert(!Bench.isSlowFigure(100000L, 0.0)) // no committed value
  }

  test("committedFigures reads the top-level throughput fields") {
    val tmp = java.nio.file.Files.createTempFile("bench_prev_fig", ".json")
    java.nio.file.Files.write(tmp,
      ("""{"metric":"total","value":114.0,"queries":{"q":1.0},""" +
        """"envelope_events_per_sec":334989,""" +
        """"streaming_envelope_events_per_sec":245700,"sf":"/x"}""")
        .getBytes("UTF-8"))
    val m = Bench.committedFigures(tmp.toString)
    assert(m("envelope_events_per_sec") == 334989.0)
    assert(m("streaming_envelope_events_per_sec") == 245700.0)
    assert(m("value") == 114.0) // numeric top-levels included; harmless
    assert(!m.contains("queries") && !m.contains("sf"))
    java.nio.file.Files.deleteIfExists(tmp)
  }

  test("batch/stream agreement band catches the r9 artifact") {
    // committed r9 calm pair: batch 334,989 vs stream 245,700 — agrees
    assert(Bench.batchStreamAgree(334989L, 245700L))
    // the r9 driver artifact: batch 184,752 vs stream 246,900 — the
    // batch side is below stream/1.25, the corrupted-batch signature
    assert(!Bench.batchStreamAgree(184752L, 246900L))
    // calm drift above the committed 1.36 ratio must NOT trip the
    // band (observed calm ratios span 1.02-1.37; the band is 1.6)
    assert(Bench.batchStreamAgree(380000L, 245700L)) // 1.55x: drift
    // the 16-hog contention signature (>=1.65x) MUST trip it — an r11
    // cut widened the band to 1.7 and would have stamped it agreed
    // (ADVICE r11); batch far above stream = streaming is the suspect
    assert(!Bench.batchStreamAgree(408000L, 245700L)) // 1.66x: 16-hog
    assert(!Bench.batchStreamAgree(450000L, 245700L)) // 1.83x
    // failed measurements never agree (caller keeps its retry budget)
    assert(!Bench.batchStreamAgree(-1L, 245700L))
    assert(!Bench.batchStreamAgree(334989L, -1L))
  }

  test("committed baseline is pinned to git, not the working tree") {
    // The working-tree bench_out.json is the very file Bench.main
    // overwrites at the end of each run — a second run in one session
    // must still baseline against the COMMITTED calm artifact, or a
    // contended run followed by a re-run self-reports outliers:[]
    // (r10 verdict What's-wrong #1).
    val repoFile = java.nio.file.Paths.get("bench_out.json").toAbsolutePath
    val gitHasIt =
      try {
        new ProcessBuilder("git", "-C", repoFile.getParent.toString,
          "cat-file", "-e", "HEAD:./bench_out.json").start().waitFor() == 0
      } catch { case _: Throwable => false }
    assume(gitHasIt, "not a git checkout with a committed bench_out.json")
    val original = java.nio.file.Files.readAllBytes(repoFile)
    try {
      // simulate a contended prior run having overwritten the file
      java.nio.file.Files.write(repoFile,
        ("""{"queries":{"rel_q1_agg":99.9},""" +
          """"envelope_events_per_sec":1}""").getBytes("UTF-8"))
      val m = Bench.committedQueryTimes()
      // the baseline is HEAD's calm value, not the contended 99.9 —
      // so the contended sample still fires as an outlier
      assert(m.get("rel_q1_agg").exists(_ < 10.0))
      assert(Bench.isOutlier(99.9, m("rel_q1_agg")))
      val figs = Bench.committedFigures()
      assert(figs.get("envelope_events_per_sec").exists(_ > 1000.0))
    } finally java.nio.file.Files.write(repoFile, original)
  }

  test("committed baseline walks past a contended committed artifact") {
    // The round driver commits its own bench output, and that run can
    // be contended — r10's round commit put a 176.5 s artifact with 9
    // self-flagged outliers at HEAD. The baseline must come from the
    // most recent SELF-DESCRIBED-CALM committed version, not bare
    // HEAD, or every outlier threshold silently inflates 2-5×.
    val repoFile = java.nio.file.Paths.get("bench_out.json").toAbsolutePath
    val gitHasIt =
      try {
        new ProcessBuilder("git", "-C", repoFile.getParent.toString,
          "cat-file", "-e", "HEAD:./bench_out.json").start().waitFor() == 0
      } catch { case _: Throwable => false }
    assume(gitHasIt, "not a git checkout with a committed bench_out.json")
    val bytes = Bench.committedBytes("bench_out.json")
    assert(bytes.isDefined)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(bytes.get)
    def calmField(f: String): Boolean = {
      val n = root.get(f)
      n == null || (n.isArray && n.isEmpty)
    }
    assert(calmField("outliers"), "selected baseline has outliers")
    assert(calmField("capped"), "selected baseline has capped queries")
    assert(calmField("slow_figures"), "selected baseline has slow figures")
  }

  test("requalify clears transient contention and keeps sustained flags") {
    // q_transient: sweeps caught it in a burst (3.0 s vs committed
    // 0.6); the FIRST extra pass lands calm. q_sustained: every extra
    // pass is as contended as the sweeps. q_slowclear: clears on the
    // last allowed pass.
    val committed = Map("q_transient" -> 0.6, "q_sustained" -> 0.8,
      "q_slowclear" -> 1.0)
    val best = collection.mutable.Map(
      "q_transient" -> 3.0, "q_sustained" -> 4.0, "q_slowclear" -> 5.0)
    val samples = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def sample(n: String): Unit = {
      samples(n) += 1
      val sec = n match {
        case "q_transient" => 0.55 // calm immediately
        case "q_slowclear" => if (samples(n) >= 3) 0.9 else 4.8
        case _ => 3.9 // sustained contention: never calm
      }
      if (sec < best(n)) best(n) = sec // the caller's min-merge rule
    }
    val requalified = Bench.requalify(
      Seq("q_transient", "q_sustained", "q_slowclear"), committed,
      best.get, sample)
    assert(requalified == Seq("q_transient", "q_slowclear"))
    // early exit: one pass sufficed for the transient query
    assert(samples("q_transient") == 1)
    // bounded spend: the sustained query got exactly RequalPasses
    assert(samples("q_sustained") == Bench.RequalPasses)
    assert(samples("q_slowclear") == 3)
    // min-merge left the calmer samples as the reported numbers
    assert(best("q_transient") == 0.55 && best("q_slowclear") == 0.9)
    // the survivor still reads as an outlier for the artifact
    assert(Bench.isOutlier(best("q_sustained"), committed("q_sustained")))
  }

  test("requalify spends nothing on a calm run") {
    var sampled = 0
    val out = Bench.requalify(Seq.empty, Map.empty,
      _ => Some(0.5), _ => sampled += 1)
    assert(out.isEmpty && sampled == 0)
  }

  test("calm-baseline walk skips requalified (was-contended) artifacts") {
    def art(extra: String): Array[Byte] =
      (s"""{"metric":"total","value":100.0,"queries":{"q":1.0},""" +
        s""""capped":[],"outliers":[],"slow_figures":[]$extra}""")
        .getBytes("UTF-8")
    assert(Bench.isCalmArtifact(art(""","requalified":[]""")))
    // pre-r12 artifacts lack the field entirely — still calm
    assert(Bench.isCalmArtifact(art("")))
    // a run that converged only via requalification is NOT a baseline
    assert(!Bench.isCalmArtifact(art(""","requalified":["graph_pagerank"]""")))
    // and the existing flags still disqualify
    assert(!Bench.isCalmArtifact(
      ("""{"queries":{"q":1.0},"capped":[],"slow_figures":[],""" +
        """"outliers":[{"query":"q","sec":9.0,"committed":1.0}]}""")
        .getBytes("UTF-8")))
    assert(!Bench.isCalmArtifact("not json".getBytes("UTF-8")))
  }

  test("committedBytes falls back to the file outside a git checkout") {
    val tmp = java.nio.file.Files.createTempFile("bench_nogit", ".json")
    java.nio.file.Files.write(tmp,
      """{"queries":{"q":1.5}}""".getBytes("UTF-8"))
    assert(Bench.committedQueryTimes(tmp.toString) == Map("q" -> 1.5))
    java.nio.file.Files.deleteIfExists(tmp)
  }
}
