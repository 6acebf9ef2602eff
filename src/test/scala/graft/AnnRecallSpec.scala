package graft

import org.apache.spark.sql.functions._

/** Approximation-quality gates for the ANN paths: recall@10 against the
  * brute-force ground truth must stay useful. This pins the trade each
  * scale path makes, so a refactor that silently destroys recall fails
  * the build rather than the user.
  */
class AnnRecallSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def topk(name: String): Map[(Long, Long), Int] =
    SparkEntry.queries(name)(spark, d)
      .select(col("q_id"), col("vec_id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  // ground truth computed once — the exact O(|Q|*N) scan is the same for
  // all three recall gates
  private lazy val exact: Map[(Long, Long), Int] = topk("q61_ann_bruteforce")

  private def recallVsExact(name: String): Double = {
    val approx = topk(name)
    val recall = exact.keySet.count(approx.contains).toDouble / exact.size
    info(f"recall@10 = $recall%.3f (${exact.size} ground-truth pairs)")
    recall
  }

  test("LSH multi-probe ANN achieves >= 0.5 recall@10 vs brute force at sf0.001") {
    val r = recallVsExact("q62_ann_lsh_bucketed")
    assert(r >= 0.5, f"LSH ANN recall degraded: $r%.3f")
  }

  test("IVF nprobe=32/64 ANN achieves >= 0.7 recall@10 vs brute force at sf0.001") {
    // the UNTRAINED codebook (vec_id < 64) routes weakly — these true
    // top-10 are weak neighbors (cos 0.26-0.45), so probing must go wide
    // (32/64 lists) for 0.79 recall; trained k-means centroids reach the
    // same recall at far smaller nprobe. The gate pins the floor.
    val r = recallVsExact("q64_ann_ivf")
    assert(r >= 0.7, f"IVF ANN recall degraded: $r%.3f")
  }

  test("PQ (8x16 codebook, 32x compression) + exact rerank achieves >= 0.7 recall@10") {
    // 8-byte codes against 256-byte vectors; the ADC scan only prunes to
    // a 128-candidate shortlist and true cosine re-ranks, so recall@10 is
    // really P(true top-10 ⊆ ADC top-128) — 0.79 with an UNTRAINED
    // (vec_id<16) codebook (trained k-means would do far better). The
    // gate pins the floor so an encoding/scoring regression can't hide.
    val r = recallVsExact("q67_ann_pq")
    assert(r >= 0.7, f"PQ ANN recall degraded: $r%.3f")
  }

  test("IVFPQ (routing x codes x rerank) achieves >= 0.7 recall@10 vs brute force") {
    // recall compounds: IVF routing misses (nprobe 32/64 alone: 0.79) x
    // PQ shortlist misses (alone: 0.79); empirically 0.75 — the two
    // approximations overlap rather than multiply. Pins that the
    // production shape still returns useful neighbors after BOTH
    // approximations, with exact rerank cleaning up inside the shortlist
    val r = recallVsExact("q69_ann_ivfpq")
    assert(r >= 0.7, f"IVFPQ recall degraded: $r%.3f")
  }

  test("int8 scalar quantization achieves >= 0.9 recall@10 vs float brute force") {
    // quantization perturbs each coordinate by <= scale/2 (~0.4% of the
    // max magnitude), so top-10 membership should be nearly unchanged —
    // this is the "4x less I/O costs almost no quality" claim, pinned
    val r = recallVsExact("q66_ann_quantized")
    assert(r >= 0.9, f"quantized ANN recall degraded: $r%.3f")
  }
}
