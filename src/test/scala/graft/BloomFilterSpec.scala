package graft

/** Gates for q256's portable Bloom runtime-filter audit: the invariants
  * a correct Bloom filter cannot break (zero false negatives, at most
  * k bits set per key), and a sanity band on the measured FPR against
  * the integer fill-ratio estimate ρ² the query itself ships (the
  * shifted-AP probe set runs ~1.4× the estimate at sf0.01 — that gap
  * is exactly what the audit exists to measure, so the gate is a band,
  * not an equality).
  */
class BloomFilterSpec extends SparkSpec {

  private def row(d: String) =
    SparkEntry.queries("q256_bloom_runtime_filter")(spark, d).head()

  test("no false negatives, ever (Bloom hard invariant)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      assert(row(d).getAs[Long]("n_false_neg") == 0L, s"at $d")
    }
  }

  test("at most k=2 bits set per inserted key") {
    val r = row("/root/testdata/sf0.01")
    assert(r.getAs[Long]("set_bits") <= 2 * r.getAs[Long]("n_keys"))
    assert(r.getAs[Long]("set_bits") > r.getAs[Long]("n_keys"),
      "two independent streams should rarely fully collide")
  }

  test("measured FPR within 3x of the fill-ratio estimate") {
    val r = row("/root/testdata/sf0.01")
    val est = r.getAs[Long]("est_fpr_ppm")
    val fpr = r.getAs[Long]("fpr_ppm")
    assert(r.getAs[Long]("n_nonmembers") > 0, "probe set must have non-members")
    assert(fpr <= 3 * est + 5000, s"fpr $fpr vs est $est")
  }
}
