package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout prunes: filter on partition col reads only matching dirs") {
    val d = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/li"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .withColumn("ship_day", to_date(col("l_shipdate")))
    Layout.writePartitioned(li, out, Seq("ship_day"))

    val pruned = spark.read.parquet(out).filter(col("ship_day") === "1998-11-29")
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("ship_day"))
    // physical proof: scanned file count << total partition dirs
    val totalDays = li.select("ship_day").distinct().count()
    assert(totalDays > 100)
    val scanned = pruned.select(input_file_name()).distinct().count()
    assert(scanned <= 2, s"expected <=2 files scanned, got $scanned of $totalDays days")
    assert(pruned.count() ==
      li.filter(col("ship_day") === "1998-11-29").count())
  }

  test("salted aggregation equals plain aggregation, spread over salts") {
    // heavy skew: 90% of rows share one key
    val rows = (1 to 2000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble))
    val df = rows.toDF("key", "v").repartition(8)
    val salted = Layout.saltedSumCount(df, "key", col("v"), salts = 16)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(math.abs(s - plain(k)._1) < 1e-6 && n == plain(k)._2)
    }
  }

  test("salted join matches the plain join exactly") {
    val big = (1 to 1000).map(i => (if (i % 5 == 0) i % 3 else 0, i)).toDF("k", "v")
    val small = Seq((0, "hot"), (1, "a"), (2, "b")).toDF("k", "name")
    val (bs, ss, cond) = Layout.saltedJoinKeys(big, small, "k", salts = 8, bigSaltCols = Seq(col("v")))
    val salted = bs.join(ss, cond).select(bs("k"), col("v"), col("name"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val plain = big.join(small, "k").select(col("k"), col("v"), col("name"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }
}
