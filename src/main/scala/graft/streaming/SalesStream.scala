package graft.streaming

import graft.pipeline.{Clean, Schemas}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest of the sales feeds reproducing `poc_analysis`
  * incrementally (SURVEY.md §7 phase 6 — the streaming-ification of the
  * reference's batch watermark loop): each city feed is consumed as an
  * arriving-file stream with the SAME per-city schema/options as the
  * batch readers (`pipeline/SalesSources`), and the poc query becomes a
  * watermarked 1-day tumbling aggregation over the union.
  *
  * Operator order mirrors the batch `CocktailPipeline.pocAnalysis`:
  *
  *   stream ──left join──► drinks dim (STATIC, broadcast — stateless)
  *          ──1-day window agg (watermark finalizes days, evicts state)
  *          ──left join──► stock dim (STATIC, broadcast — stateless)
  *          ──CASE comment
  *
  * Both dimension joins are stream-static: no join state, the stream
  * never shuffles for them; the only stateful operator is the windowed
  * count, whose state is one row per open (day, drink, price, bar,
  * glass) group and is evicted once the watermark passes the day.
  * Append mode emits each day exactly once, when it finalizes — the
  * incremental contract the reference approximates with its watermark
  * file (re-runs append only newer-than-last-seen rows).
  *
  * Surrogate keys (`saleID`) are deliberately absent: they would demand
  * a global order over an unbounded stream; `poc_analysis` never reads
  * them (the batch path keeps them for the relational catalog).
  *
  * Timezone contract: `window(ts, "1 day")` aligns to UTC-epoch days
  * while the batch path's `to_date` uses the session timezone — the
  * proven row-equality therefore requires
  * `spark.sql.session.timeZone=UTC`, which GraftSession (and the test
  * session) pin. A non-UTC deployment must pass the zone's offset as
  * the window's startTime to keep the two paths' day boundaries equal.
  */
object SalesStream {

  /** One city feed as a file stream — schema and quirks come from the
    * SAME [[graft.pipeline.SalesSources.cityOptions]] table the batch
    * readers use, so the two paths cannot drift; `city` fixes the bar
    * column like SalesSources does.
    */
  def feed(spark: SparkSession, dir: String, city: String): DataFrame = {
    val opts = graft.pipeline.SalesSources.cityOptions.getOrElse(city,
      throw new IllegalArgumentException(s"unknown city: $city"))
    spark.readStream.schema(Schemas.salesRaw)
      .options(opts)
      .csv(dir)
      .withColumn("bar", lit(city))
  }

  /** The incremental poc_analysis: same projection, grouping, and CASE
    * semantics as the batch form, windowed by day. `cocktailsDf` and
    * `stockDf` are STATIC (batch) dimensions — the output schema matches
    * the batch `pocAnalysis` exactly.
    */
  def incrementalPoc(sales: DataFrame, cocktailsDf: DataFrame, stockDf: DataFrame,
      watermark: String = "2 days"): DataFrame = {
    val cleaned = Clean.lowercaseStrings(
      sales.select(col("dateOfSale"), col("drink"), col("price"), col("bar")))
    val dim = cocktailsDf.select("strDrink", "strGlass")
    val grouped = cleaned
      .withWatermark("dateOfSale", watermark)
      .join(broadcast(dim), cleaned("drink") === dim("strDrink"), "left")
      .groupBy(window(col("dateOfSale"), "1 day").as("win"),
        col("drink"), col("price"), col("bar"), col("strGlass"))
      .agg(count(col("drink")).as("drinkCount"))
      .select(col("win.start").cast("date").as("dayOfSale"),
        col("drink"), col("price"), col("bar"), col("strGlass"), col("drinkCount"))
    val stock = stockDf.select(col("glassType"), col("bar").as("stockBar"), col("stock"))
    grouped
      .join(broadcast(stock),
        grouped("strGlass") === stock("glassType") && grouped("bar") === stock("stockBar"),
        "left")
      .select(col("dayOfSale"), col("drink"), col("price"), col("bar"),
        col("strGlass"), col("drinkCount"), col("stock"),
        when(col("drinkCount") < col("stock"), "NO ISSUE")
          .when(col("drinkCount") >= col("stock"), "POTENTIAL ISSUE")
          .as("comment"))
  }
}
