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
    // band (the 1.5 ratio left ~10% headroom; widened to 1.7)
    assert(Bench.batchStreamAgree(400000L, 245700L)) // 1.63x: drift
    // batch far above stream: the streaming side is the suspect
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

  test("committedBytes falls back to the file outside a git checkout") {
    val tmp = java.nio.file.Files.createTempFile("bench_nogit", ".json")
    java.nio.file.Files.write(tmp,
      """{"queries":{"q":1.5}}""".getBytes("UTF-8"))
    assert(Bench.committedQueryTimes(tmp.toString) == Map("q" -> 1.5))
    java.nio.file.Files.deleteIfExists(tmp)
  }
}
