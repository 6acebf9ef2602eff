package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guard against driver-side testdata regeneration drift — the round-7
  * lesson: `/root/testdata` is the one input this engine does not own,
  * and a silent re-encode (events.ts INT64 TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS) broke twelve queries at analysis time with nothing
  * pointing at the cause. This spec turns the next regeneration into one
  * red assertion with a pointer:
  *
  *  1. every table loads through its [[Tables]] accessor and every
  *     column is projectable (a dropped/renamed/retyped column fails
  *     here, named, before any query sees it);
  *  2. [[Tables.normalizeEventTs]] maps all three `ts` encodings the
  *     testdata has ever shipped (nanos-as-long, TIMESTAMP_NTZ micros,
  *     session-TZ timestamp) to the same TimestampType values.
  */
class TestdataDriftSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  for (t <- Tables.all) {
    test(s"$t loads and every column projects") {
      val df =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.load(spark, sfDir, t)
      val cols = df.columns
      assert(cols.nonEmpty)
      // one-by-one so a failure names the column, not just the table
      for (c <- cols) df.select(col(c)).limit(1).collect()
      assert(df.limit(1).count() == 1, s"$t is empty")
    }
  }

  test("events.ts loads as session-TZ TimestampType whatever the parquet carried") {
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }

  test("normalizeEventTs: nanos-as-long, NTZ micros, and timestamp agree") {
    // 2024-03-01 12:34:56.789012 UTC, plus a pre-epoch instant (floor
    // division, not truncation, is what keeps those two branches equal)
    val micros = Seq(1709296496789012L, -123456789L)
    val nanos = micros.map(us => us * 1000L + 999L) // sub-micro residue dropped

    val fromNanos = Tables.normalizeEventTs(nanos.toDF("ts"))
    val fromNtz = Tables.normalizeEventTs(
      micros.toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val fromTs = Tables.normalizeEventTs(
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))

    def vals(df: org.apache.spark.sql.DataFrame): Seq[Timestamp] = {
      assert(df.schema("ts").dataType == TimestampType)
      df.collect().map(_.getTimestamp(0)).toSeq
    }
    val expected = micros.toDF("us").select(timestamp_micros(col("us")))
      .collect().map(_.getTimestamp(0)).toSeq
    assert(vals(fromNanos) == expected)
    assert(vals(fromNtz) == expected)
    assert(vals(fromTs) == expected)
  }

  test("documents.source carries 20 distinct values (the |sources| bound constant)") {
    // the r14 verdict's hygiene finding: allowlist bound comments said
    // "the 4-source table" while the corpus ships 20 — every
    // |sources|-bounded zero-key-window bound and broadcast-axis sizing
    // note cites this constant, so its next drift must be one red
    // assertion with a pointer (re-measure, then update
    // PlanAudit.zeroKeyWindowAllowlist comments and docs/SCALE.md rows
    // that size |sources|-bounded axes)
    val n = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(n == 20L,
      s"documents.source now has $n distinct values (was 20): update the " +
        "|sources|-bounded allowlist/broadcast-axis comments to the new " +
        "measured constant")
  }
}
