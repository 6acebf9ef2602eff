package graft

/** Hand-pinned math + structural invariants for the round-15 training-
  * prep additions: q358 (Mann–Whitney U from the value-count rollup —
  * the closed-form rank-sum is subtle enough to deserve a known-answer
  * fixture), q359 (the halving-decay effective-token closed form),
  * q360 (the nested scaling ladder's containment), and q361 (growth-
  * class scaling of the broadcast verdict). The DuckDB oracle checks
  * all four on real testdata; this pins the ARITHMETIC on inputs whose
  * right answer is known independently.
  */
class ScalingBudgetStatsSpec extends SparkSpec {

  test("q358: U, rank-sum, tie term and z match the hand-worked fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mw-").toString
    try {
      // group A (en): lengths 1,2,2,5; group B (fr): 2,3,3
      // pooled avg ranks: 1->1, the three 2s -> 3, the two 3s -> 5.5, 5->7
      // R_A = 1+3+3+7 = 14, U_A = R_A - n_a(n_a+1)/2 = 14-10 = 4
      // ties: t=3 (value 2) and t=2 (value 3): T = 24 + 6 = 30
      // z = (2U - n_a n_b)/sqrt(n_a n_b ((n+1)n(n-1) - T)/(3 n(n-1)))
      //   = -0.7409585... -> z_micro = -740959
      Seq(
        (1L, "t", "en", "s1", 1L), (2L, "t", "en", "s1", 2L),
        (3L, "t", "en", "s1", 2L), (4L, "t", "en", "s1", 5L),
        (5L, "t", "fr", "s1", 2L), (6L, "t", "fr", "s1", 3L),
        (7L, "t", "fr", "s1", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = SparkEntry.queries("q358_mann_whitney")(spark, dir).collect()
      assert(r.length == 1)
      val row = r.head
      assert(row.getLong(1) == 4L && row.getLong(2) == 3L)   // n_a, n_b
      assert(row.getString(3) == "8")                         // 2*U_A
      assert(row.getString(4) == "30")                        // tie term
      assert(row.getLong(5) == -740959L)                      // z_micro
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q358: 0 <= 2U_A <= 2 n_a n_b on real data (U_B complement identity)") {
    val rows = SparkEntry.queries("q358_mann_whitney")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      val twoUa = r.getString(3).toLong
      assert(twoUa >= 0 && twoUa <= 2 * na * nb,
        s"${r.getString(0)}: 2U_A=$twoUa outside [0, ${2 * na * nb}]")
    }
  }

  test("q359: effective tokens obey the halving-decay closed form and bounds") {
    val rows = SparkEntry.queries("q359_repetition_budget")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getLong(1); val budget = r.getLong(3)
      val f = r.getLong(4); val rem = r.getLong(5)
      val sat = r.getBoolean(6)
      val eff = r.getString(7).toLong
      if (sat) assert(rem == 0L)
      else assert(rem == budget - f * u, s"rem mismatch for ${r.getString(0)}")
      val pw = 1L << f
      assert(eff == u * (2000000L - 2000000L / pw) + rem * (1000000L / pw))
      // a budgeted token is never worth MORE than a fresh one
      if (budget > 0) assert(r.getLong(8) <= 1000000L)
      // and the effective mass never exceeds the 2x asymptote
      assert(eff <= 2000000L * u)
    }
  }

  test("q360: rungs are nested (docs/tokens nondecreasing, one shared eval)") {
    val rows = SparkEntry.queries("q360_data_scaling_ladder")(
      spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val docs = rows.map(_.getLong(1)); val toks = rows.map(_.getLong(2))
    assert(docs.zip(docs.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getLong(3)).distinct.length == 1) // same eval split
    assert(rows.head.isNullAt(5) && rows.tail.forall(!_.isNullAt(5)))
  }

  test("q362: Hill estimator matches the hand-worked fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hill-").toString
    try {
      // one language, lengths 400, 200, 100: k = min(32, 3-1) = 2,
      // x_ref = x_(3) = 100, sum_log = round(ln 4 * 1e6) + round(ln 2 * 1e6)
      //       = 1386294 + 693147 = 2079441
      // alpha_micro = 2 * 1e12 // 2079441 = 961796 (alpha ~ 0.96)
      Seq((1L, "t", "en", "s", 400L), (2L, "t", "en", "s", 200L),
        (3L, "t", "en", "s", 100L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = SparkEntry.queries("q362_hill_tail_index")(spark, dir).collect()
      assert(r.length == 1)
      assert(r.head.getLong(1) == 3L && r.head.getLong(2) == 2L)
      assert(r.head.getLong(3) == 100L)
      assert(r.head.getLong(4) == 2079441L)
      assert(r.head.getLong(5) == 961796L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q363: conditioning never increases entropy; redundancy in [0, 1e6]") {
    val rows = SparkEntry.queries("q363_entropy_rate")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h1, h2) = (r.getLong(2), r.getLong(3))
      assert(h2 <= h1, s"${r.getString(0)}: H(next|cur)=$h2 > H(cur)=$h1")
      val red = r.getLong(4)
      assert(red >= 0 && red <= 1000000L)
    }
  }

  test("q361: growth class drives the 1000x broadcast verdict") {
    val rows = SparkEntry.queries("q361_broadcast_plan_advisor")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("region", "nation", "supplier", "customer", "part"))
    Seq("region", "nation").foreach { t =>
      assert(rows(t).getLong(4) == rows(t).getLong(3)) // static: same bytes
      assert(rows(t).getBoolean(6), s"$t must broadcast at any SF")
    }
    Seq("supplier", "customer", "part").foreach { t =>
      assert(rows(t).getLong(4) == 1000L * rows(t).getLong(3))
    }
  }
}
