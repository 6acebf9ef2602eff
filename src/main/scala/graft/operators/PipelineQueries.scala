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

  val defs: Seq[QueryDef] = Seq(q70)
}
