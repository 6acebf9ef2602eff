package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("vec_dot / vec_cosine resolve in pure SQL via spark.sql.extensions") {
    // `spark.sql.extensions` is a STATIC conf read when the SparkContext is
    // created, so inside the shared test JVM (context built by TestSpark
    // without it) the config path can't be exercised; `withExtensions`
    // runs the identical GraftExtensions registration code. The config
    // path itself is what GraftSession sets and Verify/Bench run under.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
    val row = s.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       vec_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS z""".stripMargin)
      .collect().head
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.isNullAt(2))
    val mh = s.sql(
      "SELECT minhash_sig(array('a','b'), 4) AS sig, simhash64(array('a','b')) AS sh")
      .collect().head
    assert(mh.getSeq[Long](0).length == 4)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
