package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the corpus-derived defaults for the two LSH-geometry knobs.
  *
  * The ×100 scale probe proved 2^planes must track corpus size (a
  * fixed plane count makes the within-bucket join quadratic — the
  * sim_knn_graph super-linear point), and sum(|cell|²) likewise wants
  * |cell| constant. The UNSET defaults are therefore derived from the
  * corpus count — ceil(log2(N / TargetBucketPop)) planes and
  * ceil(N / TargetCellPop) cells — so a 100-TB user gets a sane
  * geometry without having to know the failure mode. This spec pins
  * the derivation at three corpus sizes, its clamps, and the
  * oracle-coincidence anchor (the verification corpus derives exactly
  * the constants the DuckDB SQL hard-codes; Verify additionally pins
  * the knobs explicitly, so correctness never depends on this).
  */
class DerivedKnobSpec extends AnyFunSuite {

  test("derived plane count tracks corpus size (three sizes)") {
    // N=500 (the sf0.01 verification corpus): exactly the oracle
    // constant — ceil(log2(500/8)) = 6
    assert(SimilarityQueries.derivedPlanes(500L) === SimilarityQueries.NPlanes)
    // N=50k: ceil(log2(6250)) = 13 → 8192 buckets, ~6 vectors each
    assert(SimilarityQueries.derivedPlanes(50000L) === 13)
    // N=5M: ceil(log2(625000)) = 20 (also the clamp ceiling)
    assert(SimilarityQueries.derivedPlanes(5000000L) === 20)
  }

  test("derived cell count tracks corpus size (three sizes)") {
    // N=500: exactly the oracle constant — ceil(500/64) = 8
    assert(SimilarityQueries.derivedCells(500L) === SimilarityQueries.NCentroids)
    // N=50k: ceil(50000/64) = 782 cells, ~64 vectors each
    assert(SimilarityQueries.derivedCells(50000L) === 782)
    // N=5M: ceil(5000000/64) = 78125
    assert(SimilarityQueries.derivedCells(5000000L) === 78125)
  }

  test("derivations clamp at both ends") {
    assert(SimilarityQueries.derivedPlanes(0L) === 1)
    assert(SimilarityQueries.derivedPlanes(1L) === 1)
    // far past 2^20 target buckets: planes cap at 20 (exact bit
    // weights; trivial plane broadcast)
    assert(SimilarityQueries.derivedPlanes(1L << 40) === 20)
    assert(SimilarityQueries.derivedCells(0L) === 1)
    assert(SimilarityQueries.derivedCells(1L) === 1)
    // cells cap at 2^20 (the 512 MB broadcastable-centroid ceiling)
    assert(SimilarityQueries.derivedCells(1L << 40) === (1 << 20))
  }

  test("an explicit knob always wins over the derivation") {
    val spark = graft.GraftSession.builder("4").getOrCreate()
    try {
      spark.conf.set("graft.lsh.planes", "11")
      spark.conf.set("graft.kmeans.cells", "33")
      assert(SimilarityQueries.lshPlanes(spark, "/root/testdata/sf0.001") === 11)
      assert(SimilarityQueries.kmeansCells(spark, "/root/testdata/sf0.001") === 33)
    } finally {
      spark.conf.unset("graft.lsh.planes")
      spark.conf.unset("graft.kmeans.cells")
    }
  }

  test("unset knobs resolve to the corpus-derived value") {
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.conf.unset("graft.lsh.planes")
    spark.conf.unset("graft.kmeans.cells")
    val d = "/root/testdata/sf0.001"
    val n = graft.Tables.embeddings(spark, d).count()
    assert(SimilarityQueries.lshPlanes(spark, d)
      === SimilarityQueries.derivedPlanes(n))
    assert(SimilarityQueries.kmeansCells(spark, d)
      === SimilarityQueries.derivedCells(n))
  }
}
