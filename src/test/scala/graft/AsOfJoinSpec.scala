package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import graft.pipeline.SqlScripts

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks the newest right row at or before each left ts") {
    val trades = Seq(
      (1L, t("2024-01-01 10:00:05"), 100.0),
      (1L, t("2024-01-01 10:00:20"), 101.0),
      (2L, t("2024-01-01 10:00:10"), 50.0)
    ).toDF("sym", "ts", "trade_px")
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 99.5),
      (1L, t("2024-01-01 10:00:05"), 99.9), // equal ts: must match
      (1L, t("2024-01-01 10:00:15"), 100.5),
      (3L, t("2024-01-01 09:00:00"), 1.0)   // other key: never leaks
    ).toDF("sym", "quote_ts", "quote_px")

    val out = AsOfJoin.backward(trades, quotes, "sym", "ts", "quote_ts",
        Seq("quote_px", "quote_ts"))
      .collect()
      .map(r => (r.getAs[Long]("sym"), r.getAs[Timestamp]("ts"),
        Option(r.getAs[Any]("quote_px")))).toSet
    assert(out == Set(
      (1L, t("2024-01-01 10:00:05"), Some(99.9)),  // ts-equal quote wins
      (1L, t("2024-01-01 10:00:20"), Some(100.5)), // newest prior
      (2L, t("2024-01-01 10:00:10"), None)))       // no quotes for key 2
  }

  test("as-of join has one shuffle, no range cross-join") {
    val l = Seq((1L, t("2024-01-01 00:00:01"))).toDF("k", "ts")
    val r = Seq((1L, t("2024-01-01 00:00:00"), 1.0)).toDF("k", "rts", "v")
    val plan = AsOfJoin.backward(l, r, "k", "ts", "rts", Seq("v"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join")) // union+window formulation: no join operator at all
    assert(plan.contains("Window"))
  }

  test("newest right row wins even when its payload field is NULL (no stale substitution, no tearing)") {
    val l = Seq((1L, t("2024-01-01 00:00:03"))).toDF("k", "ts")
    // newest matching right row has v=NULL, w=20; the older row has v=5, w=10.
    // Correct as-of: (NULL, 20) from the SAME newest row — not v=5 rescued
    // from the older row (stale) and never (5, 20) (torn across rows).
    val r = Seq(
      (1L, t("2024-01-01 00:00:01"), Option(5.0), Option(10.0)),
      (1L, t("2024-01-01 00:00:02"), Option.empty[Double], Option(20.0)))
      .toDF("k", "rts", "v", "w")
    val out = AsOfJoin.backward(l, r, "k", "ts", "rts", Seq("v", "w")).collect().head
    assert(out.isNullAt(out.fieldIndex("v")), s"stale non-null payload substituted: $out")
    assert(out.getAs[Double]("w") == 20.0)
  }

  test("SqlScripts.split respects literals and comments") {
    val script =
      """SELECT 'a;b' AS x; -- trailing; comment
        |/* block; comment */ SELECT 2; SELECT 'it''s; fine'""".stripMargin
    val stmts = SqlScripts.split(script)
    assert(stmts.length == 3)
    assert(stmts.head == "SELECT 'a;b' AS x")
    assert(stmts(2) == "SELECT 'it''s; fine'")
  }

  test("SqlScripts.execute runs statements in order and returns the last result") {
    val out = SqlScripts.execute(spark,
      """CREATE OR REPLACE TEMPORARY VIEW sq_test AS SELECT 1 AS a UNION ALL SELECT 2;
        |SELECT sum(a) AS s FROM sq_test""".stripMargin)
    assert(out.get.collect().head.getLong(0) == 3L)
  }
}
