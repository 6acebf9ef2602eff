package graft

/** ADVICE.md hygiene contract (round-12 verdict task: "pin it like the
  * README ledger"): the file exists to carry ACTIONABLE advisor items,
  * and the failure mode it grew was the opposite — items kept listed
  * after their fixes landed, so readers couldn't tell open findings
  * from history. The contract this spec enforces: by the time a
  * round's work is committed, every entry is either fixed (and
  * annotated FIXED, with the fix named) or genuinely still open — and
  * "still open" fails the build loudly, which is the forcing function.
  * A fresh advisor drop at round start therefore fails `sbt test`
  * until the builder works the list, exactly like a red spec.
  */
class AdviceLedgerSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("every ADVICE.md entry is annotated FIXED (open items fail the build)") {
    val p = java.nio.file.Paths.get("ADVICE.md")
    assume(java.nio.file.Files.exists(p), "no ADVICE.md in CWD")
    val advice = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // entries are top-level bullets; continuation/indented lines belong
    // to the entry above them
    val open = advice.linesIterator.zipWithIndex
      .filter { case (l, _) => l.startsWith("- ") }
      .filterNot { case (l, _) => l.startsWith("- FIXED") }
      .map { case (l, i) => s"ADVICE.md:${i + 1}: ${l.take(100)}" }
      .toSeq
    assert(open.isEmpty,
      s"unfixed advisor items remain:\n${open.mkString("\n")}")
  }
}
