package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("vec_dot / vec_cosine resolve in pure SQL via spark.sql.extensions") {
    // fresh session (newSession shares extensions of the root builder;
    // build explicitly with the extensions config like GraftSession does)
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val row = s.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       vec_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS z""".stripMargin)
      .collect().head
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.isNullAt(2))
  }
}
