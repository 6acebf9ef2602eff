package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins both wire shapes [[Bench.parsePrevQueries]] must read — a plain
  * bench.json line and the driver's BENCH_r*.json with the same line
  * escaped inside its "tail" string — plus the foreign-sf guard. The
  * escaped shape is the round-8 lesson: a regex anchored on `"q...":`
  * silently matched names WITH a trailing backslash against the driver
  * file, so the 1.5×-previous-round trigger never fired.
  */
class BenchPrevParseSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  test("plain bench.json shape parses") {
    val txt =
      """{"metric":"total","value":74.2,"unit":"sec","queries":{"q17_poc_analysis":0.732,"q147_streaming_poc":3.6},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parsePrevQueries(txt, sf) ==
      Map("q17_poc_analysis" -> 0.732, "q147_streaming_poc" -> 3.6))
  }

  test("driver BENCH_r*.json escaped-tail shape parses with clean names") {
    val txt =
      """{"n":"7","rc":"0","sf":"0.1","tail":"{\"metric\":\"total\",\"value\":69.541,\"queries\":{\"q17_poc_analysis\":0.709,\"q165_bpe_apply\":2.261},\"sf\":\"/root/testdata/sf0.1\"}"}"""
    val m = Bench.parsePrevQueries(txt, sf)
    assert(m == Map("q17_poc_analysis" -> 0.709, "q165_bpe_apply" -> 2.261))
    assert(m.keys.forall(!_.contains("\\")), "names must not carry the escape backslash")
  }

  test("E-notation values (Double.toString below 1e-3) parse instead of crashing") {
    val txt =
      """{"metric":"total","queries":{"q99_fast":9.5E-4,"q98_big":1.2E2},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parsePrevQueries(txt, sf) ==
      Map("q99_fast" -> 9.5e-4, "q98_big" -> 120.0))
  }

  test("a record from a different scale factor is rejected entirely") {
    val txt =
      """{"metric":"total","queries":{"q17_poc_analysis":0.1},"sf":"/root/testdata/sf0.001"}"""
    assert(Bench.parsePrevQueries(txt, sf).isEmpty)
  }

  test("a multi-record file keeps only the matching-sf line's timings") {
    val txt =
      """{"metric":"total","queries":{"q17_poc_analysis":0.01,"q99_only_small":0.02},"sf":"/root/testdata/sf0.001"}
        |{"metric":"total","queries":{"q17_poc_analysis":0.732},"sf":"/root/testdata/sf0.1"}""".stripMargin
    val m = Bench.parsePrevQueries(txt, sf)
    assert(m == Map("q17_poc_analysis" -> 0.732),
      "foreign-sf lines must not leak their timings into the map")
  }

  test("a history file's LATER matching line wins (most recent sweep is the reference)") {
    val txt =
      """{"metric":"total","queries":{"q151_vocab_coverage":0.55},"sf":"/root/testdata/sf0.1"}
        |{"metric":"total","queries":{"q151_vocab_coverage":0.37,"q17_poc_analysis":0.68},"sf":"/root/testdata/sf0.1"}""".stripMargin
    assert(Bench.parsePrevQueries(txt, sf) ==
      Map("q151_vocab_coverage" -> 0.37, "q17_poc_analysis" -> 0.68))
  }

  test("the real driver BENCH_r07.json parses (if present)") {
    val p = java.nio.file.Paths.get("/root/repo/BENCH_r07.json")
    assume(java.nio.file.Files.exists(p))
    val m = Bench.parsePrevQueries(java.nio.file.Files.readString(p), sf)
    assert(m.nonEmpty)
    assert(m.contains("q17_poc_analysis"))
    assert(m.keys.forall(!_.contains("\\")))
  }

  test("carriedDelta decomposes carried vs new and excludes failures") {
    val results = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> -1.0, "q4_new" -> 4.0)
    val prev = Map("q1" -> 0.5, "q2" -> 2.0, "q3" -> 1.0, "q_gone" -> 9.0)
    val (cN, cSec, cPrev, cMed, nN, nSec, pfN, pfSec) =
      Bench.carriedDelta(results, prev)
    assert(cN == 2 && cSec == 3.0 && cPrev == 2.5)
    // ratios: q1 2.0, q2 1.0 -> even size: median = MEAN of the two
    // middle elements (r14 advisor — the upper element biased the
    // carried evidence upward)
    assert(cMed == 1.5)
    assert(nN == 1 && nSec == 4.0)
    assert(pfN == 0 && pfSec == 0.0)
  }

  test("carriedDelta: odd-sized ratio list keeps the exact middle element") {
    val results = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 9.0)
    val prev = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0)
    val (_, _, _, cMed, _, _, _, _) = Bench.carriedDelta(results, prev)
    assert(cMed == 2.0)
  }

  test("carriedDelta separates prev-FAILED queries from genuinely new ops") {
    // q_pf failed last round (prev -1): it is NOT a new op — folding it
    // into new_sec inflated the carried-vs-new evidence (r14 advisor);
    // a prev of 0.0 is equally unusable as a ratio base
    val (cN, _, _, _, nN, nSec, pfN, pfSec) = Bench.carriedDelta(
      Map("a" -> 1.0, "q_pf" -> 3.0, "b" -> 1.0),
      Map("a" -> 0.0, "q_pf" -> -1.0))
    assert(cN == 0 && nN == 1 && nSec == 1.0)
    assert(pfN == 2 && pfSec == 4.0)
  }
}
