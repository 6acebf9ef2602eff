package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The drink-enrichment source (ref: build_database.py:28-46 — GET
  * thecocktaildb.com/api/json/v1/1/search.php?s={term} per distinct
  * drink).
  *
  * `search` takes the distinct-drink terms as a DataFrame("term") and
  * returns API-shaped rows: one row per (term, matched drink), where a
  * match is the API's fuzzy name-substring semantics. A term with no
  * match contributes no rows (the reference's empty-frame-and-continue
  * error path, build_database.py:34-44).
  */
trait CocktailSource {
  def search(spark: SparkSession, terms: DataFrame): DataFrame
}

/** Offline fixture-backed source (the environment is zero-egress;
  * FIXTURES.md F3). The fixture is a JSON catalog of API-shaped drink
  * objects (extra fields beyond the 7 projected ones included on
  * purpose); search is reproduced as a broadcast substring join —
  * lower(strDrink) contains term — which matches the API's
  * `search.php?s=` fuzzy behavior, including one term returning many
  * drinks and the same drink returned by many terms (dedup A4 collapses
  * those).
  *
  * Scale note: terms come from a distinct() over the fact table — small
  * by construction — so they broadcast; the catalog scan never shuffles.
  */
final class FixtureCocktailSource(fixturePath: String) extends CocktailSource {
  override def search(spark: SparkSession, terms: DataFrame): DataFrame = {
    val catalog = spark.read.option("multiLine", "true").json(fixturePath)
    catalog.join(
      broadcast(terms.select(lower(col("term")).as("term"))),
      contains(lower(col("strDrink")), col("term")))
  }
}

/** Live-HTTP source sketch: per-partition connection reuse via
  * mapPartitions over the terms, each partition issuing its own GETs and
  * parsing with from_json — the distributed form of the reference's
  * sequential driver loop. Not constructible here (zero-egress env);
  * fixture impl is the tested path.
  */
object CocktailSource {
  /** Project API-shaped rows down to the 7-column cocktails dimension
    * (ref: build_database.py:187-197), with the reference's casts
    * (idDrink int, dateModified timestamp at second precision;
    * build_database.py:208).
    */
  def project(raw: DataFrame): DataFrame =
    raw.select(
      col("idDrink").cast("int").as("idDrink"),
      col("strDrink"), col("strCategory"), col("strIBA"),
      col("strAlcoholic"), col("strGlass"),
      to_timestamp(col("dateModified"), "yyyy-MM-dd HH:mm:ss").as("dateModified"))
}
