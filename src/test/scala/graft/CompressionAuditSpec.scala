package graft

/** Structural invariants for the round-15 compression/smoothing audits:
  * q364 (b-bit minhash collisions are monotone in b and never negative),
  * q365 (the seen/backoff split is a partition of the eval mass), q366
  * (the disjoint-pair construction covers exactly ⌊N/2⌋ pairs). The
  * DuckDB oracle pins the VALUES; these pin the algebra the values must
  * obey no matter the corpus.
  */
class CompressionAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q364: b-bit matches >= full matches, and extra mass shrinks as b grows") {
    val rows = SparkEntry.queries("q364_bbit_minhash_audit")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L, 8L))
    rows.foreach { case (b, (full, bm, extra)) =>
      assert(bm >= full, s"b=$b: b-bit matches $bm < full $full — impossible")
      assert(extra == bm - full)
    }
    val extras = Seq(1L, 2L, 4L, 8L).map(rows(_)._3)
    assert(extras.zip(extras.tail).forall { case (a, b) => a >= b },
      s"collision mass must shrink as b grows: $extras")
  }

  test("q365: seen + backoff partitions the eval bigram mass; bits positive") {
    val rows = SparkEntry.queries("q365_stupid_backoff_score")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1),
        s"${r.getString(0)}: seen+backoff != eval mass")
      assert(r.getLong(4) > 0)
    }
  }

  test("q366: the disjoint-pair histogram covers exactly floor(N/2) pairs") {
    val n = Tables.embeddings(spark, d).count()
    val rows = SparkEntry.queries("q366_jl_projection_audit")(spark, d)
      .collect()
    assert(rows.map(_.getLong(1)).sum == n / 2)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(b >= -1 && b <= 15)
      if (b >= 0) assert(r.getLong(2) >= b * 200000,
        s"bucket $b holds a ratio below its floor")
    }
  }
}
