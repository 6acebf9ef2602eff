package graft

/** BASELINE.md watch-list hygiene (r13 verdict #8 — AdviceLedgerSpec's
  * forcing function applied to adjudication debts): every open
  * `- WATCH(rK):` entry must be re-visited within one round of the
  * current VERDICT round (K ≥ N−1), else the build fails loudly.
  * Closing an entry rewrites it `- RESOLVED(rM, was rK):` with the
  * evidence named; resolved entries never expire.
  */
class WatchListSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("no WATCH entry is more than one round behind the current verdict round") {
    val base = java.nio.file.Paths.get("BASELINE.md")
    assume(java.nio.file.Files.exists(base), "no BASELINE.md in CWD")
    val verdict = java.nio.file.Paths.get("VERDICT.md")
    assume(java.nio.file.Files.exists(verdict), "no VERDICT.md in CWD")
    val round = raw"VERDICT\s*—\s*round\s+(\d+)".r
      .findFirstMatchIn(java.nio.file.Files.readString(verdict))
      .map(_.group(1).toInt)
      .getOrElse(fail("VERDICT.md carries no round number"))
    val stale = raw"- WATCH\(r(\d+)\)".r
      .findAllMatchIn(java.nio.file.Files.readString(base))
      .map(_.group(1).toInt).filter(_ < round - 1).toSeq
    assert(stale.isEmpty,
      s"stale watch-list debts from rounds $stale (verdict round $round): " +
        "re-adjudicate and RESOLVE or re-tag them")
  }

  test("the watch-list section exists so debts have a home") {
    val s = java.nio.file.Files.readString(java.nio.file.Paths.get("BASELINE.md"))
    assert(s.contains("## Watch list"))
  }
}
