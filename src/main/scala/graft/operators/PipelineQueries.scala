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

  /** The flagship pipeline, HASH-MATCHED end to end: poc_analysis computed
    * lazily from the RAW fixture files (4 CSV dialects + JSON catalog +
    * watermark state) with every stage live — per-source parsing,
    * watermark filter, cleaning, lowercase, surrogate keys, fuzzy search
    * join, keep-newest dedup, both broadcast joins, the CASE-no-ELSE —
    * and a full DuckDB replica reading the SAME files as the oracle. q70
    * stays the sink-exercising form (its `run` mutates watermark state by
    * contract, so it uses a fresh dir); this one proves the ANSWER, not
    * just the row count. Fixtures live at a stable path so the oracle SQL
    * can name them.
    */
  private def pocOracleSql: String = {
    val f = Fixtures.stable
    val salesCols =
      "columns={'idx':'BIGINT','dateOfSale':'TIMESTAMP','drink':'VARCHAR','price':'DOUBLE'}"
    s"""WITH bs AS (
       |  SELECT lower(glass_type) AS glassType,
       |         CAST(NULLIF(regexp_extract(stock, '(\\d+)', 1), '') AS INTEGER) AS stock,
       |         lower(bar) AS bar
       |  FROM read_csv('${f("barStock")}', header=true,
       |         columns={'glass_type':'VARCHAR','stock':'VARCHAR','bar':'VARCHAR'})),
       |bsk AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY bar, glassType) - 1 AS BIGINT) AS stockID,
       |               glassType, stock, bar FROM bs),
       |feeds AS (
       |  SELECT idx, dateOfSale, drink, price, 'budapest' AS bar
       |  FROM read_csv('${f("budapest")}', header=true, compression='gzip', $salesCols)
       |  UNION ALL
       |  SELECT idx, dateOfSale, drink, price, 'london' AS bar
       |  FROM read_csv('${f("london")}', header=false, sep='\\t', compression='gzip', $salesCols)
       |  UNION ALL
       |  SELECT idx, dateOfSale, drink, price, 'new york' AS bar
       |  FROM read_csv('${f("ny")}', header=true, compression='gzip',
       |         timestampformat='%m-%d-%Y %H:%M', $salesCols)),
       |fil AS (SELECT * FROM feeds WHERE dateOfSale > TIMESTAMP '1900-01-01 00:00:00'),
       |salk AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY bar, dateOfSale, idx) - 1 AS BIGINT)
       |                  AS saleID,
       |               dateOfSale, lower(drink) AS drink, price, bar
       |        FROM fil),
       |terms AS (SELECT DISTINCT drink AS term FROM salk),
       |cat AS (SELECT * FROM read_json('${f("catalog")}',
       |          columns={'idDrink':'VARCHAR','strDrink':'VARCHAR','strCategory':'VARCHAR',
       |                   'strIBA':'VARCHAR','strAlcoholic':'VARCHAR','strGlass':'VARCHAR',
       |                   'strInstructions':'VARCHAR','dateModified':'VARCHAR'})),
       |hits AS (SELECT DISTINCT CAST(c.idDrink AS INTEGER) AS idDrink, c.strDrink,
       |                c.strCategory, c.strIBA, c.strAlcoholic, c.strGlass,
       |                CAST(c.dateModified AS TIMESTAMP) AS dateModified
       |         FROM cat c JOIN terms t ON contains(lower(c.strDrink), t.term)),
       |ded AS (SELECT * FROM (
       |          SELECT *, ROW_NUMBER() OVER (
       |            PARTITION BY idDrink, strDrink, strCategory, strIBA, strAlcoholic, strGlass
       |            ORDER BY dateModified DESC NULLS LAST, idDrink DESC) AS rn
       |          FROM hits) WHERE rn = 1),
       |ckl AS (SELECT idDrink, lower(strDrink) AS strDrink, lower(strCategory) AS strCategory,
       |               lower(strIBA) AS strIBA, lower(strAlcoholic) AS strAlcoholic,
       |               lower(strGlass) AS strGlass, dateModified FROM ded),
       |grouped AS (SELECT CAST(s.dateOfSale AS DATE) AS dayOfSale, s.drink, s.price, s.bar,
       |                   d.strGlass, CAST(count(s.drink) AS BIGINT) AS drinkCount
       |            FROM salk s LEFT JOIN (SELECT strDrink, strGlass FROM ckl) d
       |              ON s.drink = d.strDrink
       |            GROUP BY 1, 2, 3, 4, 5)
       |SELECT g.dayOfSale, g.drink, g.price, g.bar, g.strGlass, g.drinkCount, st.stock,
       |       CASE WHEN g.drinkCount < st.stock THEN 'NO ISSUE'
       |            WHEN g.drinkCount >= st.stock THEN 'POTENTIAL ISSUE' END AS comment
       |FROM grouped g LEFT JOIN (SELECT glassType, bar AS stockBar, stock FROM bsk) st
       |  ON g.strGlass = st.glassType AND g.bar = st.stockBar""".stripMargin
  }

  val q131 = QueryDef.oracle("q131_pipeline_poc", pocOracleSql)(
    (s, _) => {
      val paths = Fixtures.stable
      val p = Fixtures.pipeline(
        java.nio.file.Paths.get(paths("barStock")).getParent, paths)
      val stockDf = p.barStock(s)
      val (salesDf, _) = p.sales(s)
      val ck = p.cocktails(s, salesDf)
      p.pocAnalysis(salesDf, ck, stockDf)
    })

  val defs: Seq[QueryDef] = Seq(q70, q76, q131)
}
