package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Drives [[HttpCocktailSource]] against a loopback fixture HTTP server
  * implementing the API's `search.php?s=` substring semantics over the
  * same catalog the fixture source reads — so the two implementations
  * can be asserted row-equal, plus the error paths (404/500/garbage
  * body/no match) that must contribute zero rows.
  */
class HttpCocktailSourceSpec extends SparkSpec with BeforeAndAfterAll {

  // the four API-shaped drinks from Fixtures.writeAll's catalog
  private val drinks: Seq[Map[String, String]] = Seq(
    Map("idDrink" -> "11000", "strDrink" -> "Mojito", "strCategory" -> "Cocktail",
      "strIBA" -> "Contemporary Classics", "strAlcoholic" -> "Alcoholic",
      "strGlass" -> "Highball glass", "strInstructions" -> "muddle mint",
      "dateModified" -> "2016-11-04 09:17:09"),
    Map("idDrink" -> "11000", "strDrink" -> "Mojito", "strCategory" -> "Cocktail",
      "strIBA" -> "Contemporary Classics", "strAlcoholic" -> "Alcoholic",
      "strGlass" -> "Highball glass", "strInstructions" -> "older copy",
      "dateModified" -> "2015-01-01 00:00:00"),
    Map("idDrink" -> "11001", "strDrink" -> "Mojito Extra", "strCategory" -> "Cocktail",
      "strIBA" -> null, "strAlcoholic" -> "Alcoholic", "strGlass" -> "Copper mug",
      "strInstructions" -> "extra", "dateModified" -> "2016-01-01 00:00:00"),
    Map("idDrink" -> "11007", "strDrink" -> "Margarita", "strCategory" -> "Ordinary Drink",
      "strIBA" -> "Contemporary Classics", "strAlcoholic" -> "Alcoholic",
      "strGlass" -> "Cocktail glass", "strInstructions" -> "salt rim",
      "dateModified" -> null))

  private def jsonStr(v: String): String =
    if (v == null) "null" else "\"" + v.replace("\"", "\\\"") + "\""

  private def drinksJson(ds: Seq[Map[String, String]]): String =
    if (ds.isEmpty) """{"drinks":null}"""
    else ds.map(d => d.map { case (k, v) => s""""$k":${jsonStr(v)}""" }
      .mkString("{", ",", "}")).mkString("""{"drinks":[""", ",", "]}")

  private var server: HttpServer = _
  private var baseUrl: String = _
  private val flakyHits = new java.util.concurrent.ConcurrentHashMap[String, Integer]
  private val searchHits = new java.util.concurrent.atomic.AtomicInteger

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // 302 front door: redirects to /search.php with the same query, so the
    // client's followRedirects(NORMAL) path is exercised end-to-end
    server.createContext("/redirect/search.php", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      ex.getResponseHeaders.add("Location", s"$baseUrl/search.php?$q")
      ex.sendResponseHeaders(302, -1)
      ex.close()
    })
    server.createContext("/search.php", (ex: HttpExchange) => {
      searchHits.incrementAndGet()
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val term = q.split("&").collectFirst {
        case kv if kv.startsWith("s=") =>
          java.net.URLDecoder.decode(kv.drop(2), StandardCharsets.UTF_8)
      }.getOrElse("")
      val (code, body) = term match {
        case "boom" => (500, "internal error")
        case "garbage" => (200, "this is not json {")
        case t if t.startsWith("flaky") =>
          // 500 on the first hit for this term, then behave normally —
          // exercises the bounded-retry path
          if (flakyHits.merge(t, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b)) == 1)
            (500, "transient")
          else (200, drinksJson(drinks.filter(
            _("strDrink").toLowerCase.contains("mojito"))))
        case t =>
          (200, drinksJson(drinks.filter(
            _("strDrink").toLowerCase.contains(t.toLowerCase))))
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      try ex.getResponseBody.write(bytes) finally ex.close()
    })
    server.start()
    baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def terms(ts: String*) = {
    import spark.implicits._
    ts.toDF("term")
  }

  test("per-term GET returns one row per (term, matched drink) with the API fields") {
    // mixed case on purpose: the output term must be lowercased, matching
    // FixtureCocktailSource (the trait contract for downstream joins)
    val out = new HttpCocktailSource(baseUrl, fetchPartitions = 2)
      .search(spark, terms("Mojito", "MARGARITA"))
    val rows = out.select("term", "idDrink", "strDrink", "dateModified")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(rows === Set(
      ("mojito", "11000", "Mojito", "2016-11-04 09:17:09"),
      ("mojito", "11000", "Mojito", "2015-01-01 00:00:00"),
      ("mojito", "11001", "Mojito Extra", "2016-01-01 00:00:00"),
      ("margarita", "11007", "Margarita", null)))
  }

  test("no-match, HTTP-500, and unparseable responses contribute zero rows (continue semantics)") {
    val out = new HttpCocktailSource(baseUrl)
      .search(spark, terms("mystery drink", "boom", "garbage", "mojito extra"))
    assert(out.filter(col("term") =!= "mojito extra").count() === 0)
    assert(out.filter(col("term") === "mojito extra").count() === 1)
  }

  test("a transient 500 is retried with backoff and the term still yields rows") {
    val out = new HttpCocktailSource(baseUrl, maxRetries = 2, retryBackoffMs = 10)
      .search(spark, terms("flaky-retry"))
    // first hit 500s, the retry succeeds with the three mojito rows
    assert(out.count() === 3)
  }

  test("fetchReport distinguishes no-match from fetch-failed and counts attempts") {
    val rep = new HttpCocktailSource(baseUrl, maxRetries = 1, retryBackoffMs = 10)
      .fetchReport(spark, terms("mystery drink", "boom"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getInt(3)))).toMap
    // no-match is a SUCCESSFUL fetch (the API answers {"drinks":null})
    assert(rep("mystery drink") === ((true, 200, 1)))
    // a persistent 500 exhausts maxRetries+1 attempts and reports failure
    assert(rep("boom") === ((false, 500, 2)))
  }

  test("3xx redirects are followed (redirecting front door yields the same rows)") {
    val out = new HttpCocktailSource(s"$baseUrl/redirect").search(spark, terms("margarita"))
    assert(out.count() === 1)
  }

  test("fetch() + searchFrom/reportFrom share ONE HTTP pass per term") {
    val src = new HttpCocktailSource(baseUrl)
    val fetched = src.fetch(spark, terms("mojito", "margarita")).persist()
    try {
      fetched.count() // materialize: all GETs happen here, exactly once
      val before = searchHits.get()
      val rows = HttpCocktailSource.searchFrom(fetched).count()
      val rep = HttpCocktailSource.reportFrom(fetched)
        .filter(col("fetch_ok")).count()
      assert(rows === 4 && rep === 2)
      // deriving both views re-issued zero requests
      assert(searchHits.get() === before)
    } finally fetched.unpersist()
  }

  test("projected output is row-identical to the FixtureCocktailSource on the same catalog") {
    val dir = Files.createTempDirectory("graft-http-src")
    val catalogPath = Fixtures.writeAll(dir)("catalog")
    val t = terms("Mojito", "margarita", "Sweet Sangria", "mystery drink")
    val viaHttp = CocktailSource.project(
      new HttpCocktailSource(baseUrl).search(spark, t))
    val viaFixture = CocktailSource.project(
      new FixtureCocktailSource(catalogPath).search(spark, t))
    assert(viaHttp.exceptAll(viaFixture).count() === 0)
    assert(viaFixture.exceptAll(viaHttp).count() === 0)
    assert(viaHttp.count() === viaFixture.count())
  }
}
