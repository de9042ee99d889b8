package graft.queries

import graft.SparkSpec

/** s02 (IVF-bucketed ANN) is approximate by design — no SQL oracle.
  * Its contract is recall against the exact brute-force baseline s01. */
class SimilaritySpec extends SparkSpec {

  test("LSH ANN recall@5 beats its ~25% scan fraction (isotropic data)") {
    // Testdata embeddings are isotropic random (within-label cosine ≈ 0),
    // so ANN recall is information-bounded: the contract is recall
    // meaningfully above the scanned fraction (B=4,P=4 ⇒ ~25% scanned),
    // not a clustered-data 0.9. Measured 0.34–0.56 across seeds/scales.
    def pairs(name: String): Set[(Long, Long)] =
      Registry.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact  = pairs("s01_cosine_topk")
    val approx = pairs("s02_cosine_topk_lsh")
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.3f (exact=${exact.size}, approx=${approx.size})")
    assert(recall >= 0.3, f"LSH recall $recall%.3f below 0.3")
  }

  test("LSH ANN returns at most top-5 per query") {
    val byQuery = Registry.queries("s02_cosine_topk_lsh")(spark, sfDir)
      .groupBy("query_id").count().collect()
    assert(byQuery.forall(_.getLong(1) <= 5))
  }

  test("IVF ANN (s03) recall@5 vs exact baseline") {
    // s03 scans ~3/10 cells per query; on isotropic testdata recall is
    // bounded near the scanned fraction — assert it is at least that.
    def pairs(name: String): Set[(Long, Long)] =
      Registry.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("s01_cosine_topk")
    val ivf = pairs("s03_cosine_topk_ivf")
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.3f")
    assert(recall >= 0.25, f"IVF recall $recall%.3f below 0.25")
  }
}
