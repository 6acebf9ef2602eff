package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.JdbcSink
import org.apache.spark.sql.DataFrame

/** JdbcSink against embedded Derby: the replace/append `to_sql`
  * semantics, type round-trips, and the connection-bounding coalesce.
  */
class JdbcSinkSpec extends SparkSpec {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft-derby")
    // Derby wants to CREATE the db directory itself
    s"jdbc:derby:${dir.resolve("db")};create=true"
  }

  private def sample(tag: String, n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"$tag-$i", i * 1.5,
        Timestamp.valueOf(f"2021-01-${i % 28 + 1}%02d 10:00:00"), i % 2 == 0))
      .toDF("id", "name", "score", "ts", "flag")
  }

  private def readBack(table: String): Set[(Long, String, Double, Timestamp, Boolean)] =
    JdbcSink.read(spark, url, table, driver)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3), r.getBoolean(4)))
      .toSet

  test("replace writes and round-trips long/string/double/timestamp/boolean") {
    val df = sample("a", 10)
    JdbcSink.replace(df, url, "t_replace", driver)
    assert(readBack("t_replace") === df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3), r.getBoolean(4))).toSet)
  }

  test("replace is drop-and-recreate: a second replace leaves only the new rows") {
    JdbcSink.replace(sample("old", 10), url, "t_redo", driver)
    JdbcSink.replace(sample("new", 3), url, "t_redo", driver)
    val got = readBack("t_redo")
    assert(got.size === 3)
    assert(got.forall(_._2.startsWith("new-")))
  }

  test("append accumulates batches (the incremental global_sales contract)") {
    JdbcSink.replace(sample("b1", 4), url, "t_app", driver)
    JdbcSink.append(sample("b2", 5), url, "t_app", driver)
    val got = readBack("t_app")
    assert(got.size === 9)
    assert(got.count(_._2.startsWith("b1-")) === 4)
    assert(got.count(_._2.startsWith("b2-")) === 5)
  }

  test("write parallelism is capped at maxConnections without losing rows") {
    val df = sample("p", 40).repartition(16)
    JdbcSink.replace(df, url, "t_par", driver, maxConnections = 2)
    assert(readBack("t_par").size === 40)
  }
}
