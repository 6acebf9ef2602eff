package graft

import org.apache.spark.sql.functions._

/** q149's centroid-distance math must stay EXACT past the point where
  * the old int64 form silently wrapped (Spark non-ANSI wraps; DuckDB
  * raises — either way the exactness claim died at ~19k members/label).
  * This drives the REAL query over a tiny synthetic corpus whose terms
  * overflow int64 on the very first square, and checks every d2 against
  * BigInt arithmetic computed independently here.
  */
class DecimalOverflowSpec extends SparkSpec {

  test("q149 d2 is exact where the old int64 square would overflow") {
    import spark.implicits._
    // coords ~2e5 quantize to qv ~2e9; with 3 members, term = cnt·qv − s
    // reaches ~4e9 and term² ~1.6e19 > Long.MaxValue (9.22e18): one
    // squared term already overflows the old math.
    val rows = Seq(
      (1L, Array(200000.0f, -100000.0f), 7),
      (2L, Array(-150000.0f, 180000.0f), 7),
      (3L, Array(50000.0f, 120000.0f), 7),
      (4L, Array(10.0f, 20.0f), 8) // singleton label: d2 = 0, never flagged
    )
    val dir = java.nio.file.Files.createTempDirectory("graft-ovf-").toString
    try {
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val got = SparkEntry.queries("q149_embedding_outliers")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (BigInt(r.getString(2)), r.getLong(3), r.getBoolean(4))).toMap

      // independent exact math (BigInt end to end)
      val qv = rows.map { case (id, e, l) =>
        (id, l, e.map(x => BigInt(math.round(x.toDouble * 10000))))
      }
      val byLabel = qv.groupBy(_._2)
      val expected = qv.map { case (id, l, v) =>
        val members = byLabel(l).map(_._3)
        val cnt = BigInt(members.size)
        val d2 = v.indices.map { i =>
          val s = members.map(_(i)).sum
          val t = cnt * v(i) - s
          t * t
        }.sum
        id -> d2
      }.toMap

      // the test must actually bite: at least one vector's d2 needs a
      // term the old int64 form could not hold
      assert(expected.values.exists(_ > BigInt(Long.MaxValue)),
        "fixture too small — no d2 exceeds int64, the overflow case is untested")

      for ((id, d2) <- expected)
        assert(got(id)._1 == d2, s"vec $id: got ${got(id)._1}, expected $d2")

      // ranking consumed the exact values: label 7 has 3 members so
      // ceil(0.05·3) = 1 — its max-d2 member is flagged; the singleton
      // label 8 flags its only member by the same rule (rnk 1 ≤ 1)
      val flagged = got.filter { case (_, (_, _, out)) => out }.keySet
      val worst7 = expected.filter(e => qv.find(_._1 == e._1).get._2 == 7)
        .maxBy(_._2)._1
      assert(flagged == Set(worst7, 4L),
        s"outlier set $flagged != expected ${Set(worst7, 4L)}")
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
