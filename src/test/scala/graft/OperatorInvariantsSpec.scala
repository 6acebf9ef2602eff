package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics the SURVEY.md §2 operators must preserve, checked on crafted
  * rows (the sf-data oracle checks cover the large-scale shapes).
  */
class OperatorInvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("keep-newest dedup keeps the max-ts row per key, deterministic on ties") {
    val df = Seq(
      ("k1", Timestamp.valueOf("2020-01-01 00:00:00"), "old"),
      ("k1", Timestamp.valueOf("2020-06-01 00:00:00"), "new"),
      ("k2", Timestamp.valueOf("2020-03-01 00:00:00"), "a"),
      ("k2", Timestamp.valueOf("2020-03-01 00:00:00"), "b") // tie -> larger payload wins (desc tiebreak)
    ).toDF("key", "ts", "payload")
    val w = Window.partitionBy("key").orderBy(col("ts").desc, col("payload").desc)
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "payload").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "new", "k2" -> "b"))
  }

  test("keep-newest dedup with null ts: nulls lose to any real timestamp") {
    val df = Seq(
      ("k", Some(Timestamp.valueOf("2020-01-01 00:00:00")), "dated"),
      ("k", None, "undated")
    ).toDF("key", "ts", "payload")
    val w = Window.partitionBy("key").orderBy(col("ts").desc_nulls_last, col("payload"))
    val out = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("payload").as[String].collect()
    assert(out.toSeq == Seq("dated"))
  }

  test("CASE without ELSE yields null when no branch matches (null stock)") {
    val df = Seq((5, Some(10)), (15, Some(10)), (5, None)).toDF("cnt", "stock")
    val out = df.select(
      when(col("cnt") < col("stock"), "no issue")
        .when(col("cnt") >= col("stock"), "potential issue").as("comment"))
      .as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("no issue"), Some("potential issue"), None))
  }

  test("boundary: count == stock is POTENTIAL ISSUE (>= branch)") {
    val df = Seq((10, 10)).toDF("cnt", "stock")
    val out = df.select(when(col("cnt") < col("stock"), "no issue")
      .when(col("cnt") >= col("stock"), "potential issue").as("c")).as[String].collect()
    assert(out.head == "potential issue")
  }

  test("group-by treats null keys as one group; count(col) skips nulls, count(*) does not") {
    val df = Seq((Some("g"), Some("d")), (None, Some("d")), (None, None))
      .toDF("glass", "drink")
    val out = df.groupBy("glass")
      .agg(count(col("drink")).as("cd"), count(lit(1)).as("cstar"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((Some("g"), 1L, 1L), (None, 1L, 2L)))
  }

  test("left join preserves unmatched left rows with null right columns") {
    val sales = Seq(("mojito", 1), ("unknown drink", 2)).toDF("drink", "n")
    val dim = Seq(("mojito", "highball glass")).toDF("strDrink", "strGlass")
    val out = sales.join(dim, sales("drink") === dim("strDrink"), "left")
      .select("drink", "strGlass")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(("mojito", Some("highball glass")), ("unknown drink", None)))
  }

  test("watermark filter is strict >: boundary row excluded") {
    val wm = Timestamp.valueOf("2020-12-31 23:59:00")
    val df = Seq(
      Timestamp.valueOf("2020-12-31 23:59:00"),
      Timestamp.valueOf("2020-12-31 23:59:01")).toDF("ts")
    assert(df.filter(col("ts") > lit(wm)).count() == 1)
  }

  test("unionByName aligns columns by name, not position") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")
    val out = a.unionByName(b).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "x"), (2, "y")))
  }

  test("union row count equals sum of parts; distinct dedups across parts") {
    val a = Seq(1, 2, 3).toDF("v")
    val b = Seq(3, 4).toDF("v")
    assert(a.unionByName(b).count() == 5)
    assert(a.unionByName(b).distinct().count() == 4)
  }

  test("regex stock-extract cleans junk like '34 glasses' and casts (junk -> null, ANSI-safe)") {
    // Spark 4 ANSI mode makes ''.cast(int) throw, so the cleaning op must
    // null-guard the no-match case instead of casting blindly.
    val df = Seq("34 glasses", "12", "no digits").toDF("stock")
    val extracted = regexp_extract(col("stock"), "(\\d+)", 1)
    val out = df.select(when(extracted === "", lit(null)).otherwise(extracted)
      .cast("int").as("s"))
      .as[Option[Int]].collect()
    assert(out.toSeq == Seq(Some(34), Some(12), None))
  }

  test("lowercase normalization is idempotent and enables case-mismatched joins") {
    val sales = Seq("Mojito").toDF("drink").select(lower(col("drink")).as("drink"))
    val dim = Seq("MOJITO").toDF("strDrink").select(lower(col("strDrink")).as("strDrink"))
    assert(sales.join(dim, sales("drink") === dim("strDrink")).count() == 1)
  }

  test("to_date truncation groups a day's timestamps together") {
    val df = Seq(
      Timestamp.valueOf("2020-12-26 01:00:00"),
      Timestamp.valueOf("2020-12-26 23:59:59"),
      Timestamp.valueOf("2020-12-27 00:00:00")).toDF("ts")
    val days = df.groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0), r.getLong(1))).toMap
    assert(days == Map(Date.valueOf("2020-12-26") -> 2L, Date.valueOf("2020-12-27") -> 1L))
  }

  test("surrogate keys via row_number are 0-based, dense, deterministic") {
    val df = Seq("c", "a", "b").toDF("v")
    val out = df.select((row_number().over(Window.orderBy("v")) - 1).as("id"), col("v"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, "a"), (1, "b"), (2, "c")))
  }

  test("q95 map aggregation tolerates NULL event_type (no null map key crash)") {
    // u1 mixes typed and null events; u2 has ONLY null events and must
    // still appear with an empty map (n_types=0), matching the oracle's
    // count(CASE ...) semantics — map_from_entries on a null key would
    // throw at runtime without the when() guard.
    val df = Seq(
      (1L, Some("view")), (1L, Some("view")), (1L, None), (1L, Some("click")),
      (2L, None), (2L, None)
    ).toDF("user_id", "event_type")
    val out = graft.operators.EventQueries.typedCountsViaMap(df)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2, 2L, 1L, 0L), (2L, 0, 0L, 0L, 0L)))
  }

  test("portable MinHash-LSH: dup/near-dup/disjoint/short-doc band behavior") {
    import graft.operators.DedupQueries
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word30", "changed") // 3 of 58 grams differ
    val docs = Seq(
      (1L, base), (2L, base),       // identical
      (3L, nearDup),                // near-dup of 1/2
      (4L, (1 to 60).map(i => s"other$i").mkString(" ")), // disjoint
      (5L, "too short")             // < 3 tokens: no grams
    ).toDF("doc_id", "text")
    val sig = docs.select(col("doc_id") +: DedupQueries.portableMinhashCols(col("text")): _*)
    val dg = sig.select(col("doc_id"),
      array(DedupQueries.portableBandDigests(i => col(s"mh$i")): _*).as("digests"))
      .as[(Long, Seq[Option[Long]])].collect().toMap
    // identical texts -> identical digests in every band
    assert(dg(1L) == dg(2L))
    // a 1-word edit in 60 leaves >=1 of 4 band digests intact (this exact
    // input is deterministic; j≈0.95 makes band survival overwhelming and
    // the constants are fixed, so this can't flake)
    assert(dg(1L).zip(dg(3L)).exists { case (a, b) => a == b })
    // disjoint vocab -> no shared band digest
    assert(!dg(1L).zip(dg(4L)).exists { case (a, b) => a == b })
    // sub-gram-length doc -> all-NULL digests (excluded from banding)
    assert(dg(5L).forall(_.isEmpty))
  }
}
