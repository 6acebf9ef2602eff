package graft

import java.nio.file.Files

import graft.pipeline.Fixtures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class CocktailCatalogV2Spec extends SparkSpec {

  private lazy val catalogPath: String =
    Fixtures.writeAll(Files.createTempDirectory("graft-dsv2"))("catalog")

  private def readV2(extra: (String, String)*): DataFrame = {
    val base = spark.read.format("graft.sources.CocktailCatalogV2")
      .option("path", catalogPath)
    extra.foldLeft(base)((r, kv) => r.option(kv._1, kv._2)).load()
  }

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get

  test("reads the catalog with the declared schema; values match the json reader") {
    val v2 = readV2()
    assert(v2.schema.fieldNames.toSeq == Seq("idDrink", "strDrink", "strCategory",
      "strIBA", "strAlcoholic", "strGlass", "strInstructions", "dateModified"))
    val viaJson = spark.read.option("multiLine", "true").json(catalogPath)
    assert(v2.count() == viaJson.count())
    assert(v2.select("idDrink", "strDrink").collect().map(_.toSeq).toSet ==
      viaJson.select("idDrink", "strDrink").collect().map(_.toSeq).toSet)
  }

  test("column pruning reaches the scan (ReadSchema is the projected subset)") {
    val df = readV2().select("strDrink", "strGlass")
    val scan = scanOf(df)
    assert(scan.output.map(_.name).toSet == Set("strDrink", "strGlass"))
  }

  test("name-search filters push into the scan; others stay residual") {
    val df = readV2().filter(col("strDrink").contains("Mojito"))
    val scan = scanOf(df)
    assert(scan.scan.description().contains("StringContains(strDrink,Mojito)"))
    val names = df.select("strDrink").collect().map(_.getString(0)).toSet
    assert(names == Set("Mojito", "Mojito Extra"))

    // residual predicate on another column: correct result, not absorbed
    val res = readV2().filter(col("strGlass") === "Copper mug")
    assert(!scanOf(res).scan.description().contains("strGlass"))
    assert(res.select("strDrink").collect().map(_.getString(0)).toSet == Set("Mojito Extra"))
  }

  test("partition planning splits the scan; union over slices is lossless") {
    val df = readV2("partitions" -> "3")
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == readV2().count())
  }
}
