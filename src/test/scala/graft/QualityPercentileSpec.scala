package graft

import org.apache.spark.sql.functions._

/** q196's rank semantics: per source the ranks tile 1..n exactly,
  * top_ppm is the exact integer division it claims, the top-half flag
  * matches the cross-multiplication, and equal-quality ties break by
  * doc_id deterministically (the property a repartition could silently
  * break with an unordered tiebreak).
  */
class QualityPercentileSpec extends SparkSpec {
  import spark.implicits._

  test("ranks tile each source; ppm and top-half are exact; ties break by doc_id") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q196_quality_percentile")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      val n = rs.length.toLong
      assert(rs.forall(_._5 == n), s"$src: n_src drift")
      assert(rs.map(_._4).sorted.toSeq == (1L to n), s"$src: ranks don't tile 1..$n")
      rs.foreach { case (_, _, _, rnk, ns, ppm, half) =>
        assert(ppm == (rnk - 1) * 1000000 / ns && half == (rnk * 2 <= ns))
      }
      // rank order follows quality desc, doc_id asc — including ties
      val sorted = rs.sortBy(_._4)
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1),
          s"$src: tiebreak violated between doc ${a._1} and ${b._1}")
      }
    }
    // the corpus exercises real ties (equal quality scores in a source)
    assert(bySrc.values.exists(rs =>
      rs.groupBy(_._3).values.exists(_.length > 1)),
      "fixture no longer has quality ties — the tiebreak path is untested")
  }
}
