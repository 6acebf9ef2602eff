package graft.operators

import java.nio.file.Files

import graft.QueryDef
import graft.pipeline.Fixtures
import org.apache.spark.sql.functions._

/** The reference's own workload, end to end: S1-S4+S6 source matrix
  * (gzip CSV with discarded Hungarian header, headerless TSV, US-date
  * CSV, dirty stock CSV, watermark state file), cleaning P1-P8,
  * watermark-incremental union, fixture-backed enrichment with
  * keep-newest dedup, and the §2.8 poc_analysis query. Rows-only: inputs
  * are the engine's deterministic offline fixtures, not the sf tables.
  */
object PipelineQueries {

  val q70 = QueryDef.rowsOnly("q70_cocktails_pipeline")(
    (s, _) => {
      val dir = Files.createTempDirectory("graft-q70")
      val paths = Fixtures.writeAll(dir)
      Fixtures.pipeline(dir, paths).run(s, s"$dir/warehouse")
      s.read.parquet(s"$dir/warehouse/poc_analysis")
        .orderBy("bar", "dayOfSale", "drink", "price")
    })

  /** The DSv2 catalog source end-to-end: pushed name-search filter (the
    * API-parameter analog), column pruning, 2-way partition split, then
    * the 7-column dimension projection of build_database.py:187-197.
    * Rows-only: the fixture catalog is engine-internal. */
  val q76 = QueryDef.rowsOnly("q76_dsv2_catalog_source")(
    (s, _) => {
      val dir = Files.createTempDirectory("graft-q76")
      val catalog = Fixtures.writeAll(dir)("catalog")
      val raw = s.read.format("graft.sources.CocktailCatalogV2")
        .option("path", catalog).option("partitions", "2").load()
        .filter(col("strDrink").contains("o")) // pushed to the scan
      graft.pipeline.CocktailSource.project(raw)
        .orderBy("idDrink", "dateModified")
    })

  val defs: Seq[QueryDef] = Seq(q70, q76)
}
