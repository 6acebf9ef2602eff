package graft

import java.sql.Timestamp

import graft.operators.CurationQueries
import graft.streaming.DocStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Rule-edge fixtures for the Gopher battery (q218) plus batch ≡ stream
  * agreement for its ingest gate ([[DocStreams.gopherGate]]) — the two
  * share `gopherRuleFrame` verbatim, so this spec is what keeps that
  * sharing honest, and the crafted docs exercise the boundaries the
  * synthetic corpus can't (it has no newlines, bullets, or symbols).
  */
class GopherRuleSpec extends SparkSpec {
  import spark.implicits._

  private def rules(text: String): Map[String, Any] = {
    val df = CurationQueries.gopherRuleFrame(
      Seq((1L, text)).toDF("doc_id", "text"))
    val row = df.collect().head
    df.columns.zip(row.toSeq).toMap
  }

  private val fifty = (1 to 50).map(i => s"w$i").mkString(" ")

  test("word-count rule: 49 words fail, 50 pass (boundary inclusive)") {
    assert(rules(fifty)("r_word_count") == true)
    assert(rules((1 to 49).map(i => s"w$i").mkString(" "))("r_word_count") == false)
  }

  test("mean-word-length rule: runs of 1-char words fail, 3-char pass, 11-char fail") {
    assert(rules(Seq.fill(60)("a").mkString(" "))("r_mean_word_len") == false)
    assert(rules(Seq.fill(60)("abc").mkString(" "))("r_mean_word_len") == true)
    assert(rules(Seq.fill(60)("abcdefghijk").mkString(" "))("r_mean_word_len") == false)
  }

  test("symbol rule: > 1 symbol per 10 words fails") {
    val base = (1 to 40).map(_ => "word").mkString(" ")
    assert(rules(base + " # # # #")("r_symbol_ratio") == true) // 4 of 44
    assert(rules(base + (" #" * 9))("r_symbol_ratio") == false) // 9 # on 49 words
    // '...' counts like '#': 9 ellipses on 49 words fails the same way
    assert(rules(base + (" ..." * 9))("r_symbol_ratio") == false)
  }

  test("bullet rule: >= 90% bullet-led lines fail") {
    val bullets = (1 to 9).map(i => s"- item $i").mkString("\n")
    assert(rules(bullets + "\nprose line")("r_bullet_lines") == true) // 9 of 10
    assert(rules(bullets)("r_bullet_lines") == false) // 9 of 9
  }

  test("ellipsis-end rule: > 30% of lines ending ... fail") {
    val plain = (1 to 7).map(i => s"line $i").mkString("\n")
    assert(rules(plain + "\nx...\ny...\nz...")("r_ellipsis_lines") == true) // 3 of 10
    assert(rules(plain + "\nw...\nx...\ny...\nz...")("r_ellipsis_lines") == false) // 4 of 11? no: 4/11 > 3/10? 40>33 yes
  }

  test("alpha rule: 80% boundary — 4 of 5 alpha passes, 3 of 5 fails") {
    assert(rules("abc def ghi jkl 123")("r_alpha_words") == true)
    assert(rules("abc def ghi 123 456")("r_alpha_words") == false)
  }

  test("stop-word rule needs 2 DISTINCT stop words, case-insensitive") {
    assert(rules("The cat and dog")("r_stop_words") == true) // the + and
    assert(rules("the the the cat")("r_stop_words") == false) // 1 distinct
    assert(rules("cat dog fish")("r_stop_words") == false)
  }

  test("n_failed sums the failing rules; kept only when all pass") {
    val good = "The quick brown fox runs with great speed and " + fifty
    val g = rules(good)
    assert(g("n_failed") == 0L && g("kept") == true, s"good doc: $g")
    val bad = rules("a b c") // short, 1-char words, no stops
    assert(bad("n_failed").asInstanceOf[Long] >= 3L && bad("kept") == false)
  }

  test("streaming gopherGate == batch q218 on the sf0.001 corpus, ts preserved") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[DocStreams.Doc]
    val q = DocStreams.gopherGate(ms.toDF())
      .writeStream.format("memory").queryName("gopher").outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      val ts = Timestamp.valueOf("2024-01-01 10:00:00")
      ms.addData(first.map { case (id, tx) => DocStreams.Doc(id, ts, tx) }.toSeq)
      q.processAllAvailable()
      ms.addData(second.map { case (id, tx) => DocStreams.Doc(id, ts, tx) }.toSeq)
      q.processAllAvailable()
      val out = spark.table("gopher")
      assert(out.columns.contains("ts"), "event time must pass through the gate")
      assert(!out.columns.contains("text"), "text must not pass through the gate")
      val streamed = out.select("doc_id", "n_failed", "kept")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val batch = SparkEntry.queries("q218_gopher_rules")(spark, d)
        .select("doc_id", "n_failed", "kept")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(streamed == batch)
      assert(batch.values.exists(_._2) && batch.values.exists(!_._2),
        "corpus fixture must exercise both kept and cut docs")
    } finally q.stop()
  }
}
